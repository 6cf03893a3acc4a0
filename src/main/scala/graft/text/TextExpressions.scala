package graft.text

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.graft.Bridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions for the text/embedding training-data operators.
  * String-heavy kernels use simple codegen'd static calls (same pattern as
  * graft.expr); everything is deterministic and partitioning-independent.
  */

case class Fnv64(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fnv64"
  override protected def nullSafeEval(s: Any): Any = TextKernels.fnv1a64(s.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.text.TextKernels.fnv1a64($s.toString())")
  override protected def withNewChildInternal(c: Expression): Fnv64 = copy(child = c)
}

/** sample_bucket(id) → splitmix64-mixed UNSIGNED residue in [0, 1e6) —
  * the deterministic sampling key (TextKernels.sampleBucket). */
case class SampleBucket(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sample_bucket"
  override protected def nullSafeEval(v: Any): Any = TextKernels.sampleBucket(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.text.TextKernels.sampleBucket($v)")
  override protected def withNewChildInternal(c: Expression): SampleBucket = copy(child = c)
}

/** smix64(seed) → the full splitmix64-mixed value (signed carrier of the
  * unsigned hash; compare unsigned via `x ^ Long.MinValue`). The seeded
  * generalization of [[SampleBucket]] for epoch-keyed shuffles. */
case class Smix64(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "smix64"
  override protected def nullSafeEval(v: Any): Any = TextKernels.splitmix64(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.text.TextKernels.splitmix64($v)")
  override protected def withNewChildInternal(c: Expression): Smix64 = copy(child = c)
}

/** smix64_add(x, c) → splitmix64(x + c) with the seed addition done in
  * JVM arithmetic (wrapping). A Catalyst `x + c` would THROW on int64
  * overflow under Spark 4's default ANSI mode — and hash values are
  * uniform over the full 64-bit range, so the wrap is load-bearing, not
  * theoretical. Used by the CMS bucket probe (must agree bit-for-bit
  * with CmsAgg.reduce's JVM-side `x + r·golden`). */
case class Smix64Add(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "smix64_add"
  override protected def nullSafeEval(x: Any, c: Any): Any =
    TextKernels.splitmix64(x.asInstanceOf[Long] + c.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, c) => s"graft.text.TextKernels.splitmix64($x + $c)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Smix64Add =
    copy(left = l, right = r)
}

/** minhash_sig(text, k, shingle) → array<long> signature. */
case class MinHashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType, IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(t: Any, k: Any, n: Any): Any =
    new GenericArrayData(TextKernels.minhash(t.toString, k.asInstanceOf[Int], n.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k, n) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.text.TextKernels.minhash($t.toString(), $k, $n))")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): MinHashSig =
    copy(first = f, second = s, third = t)
}

/** hash_embed(text, buckets) → array<bigint> hashed-unigram counts
  * (TextKernels.hashEmbed). `buckets` must be a power of two. */
case class HashEmbed(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hash_embed"
  override protected def nullSafeEval(t: Any, b: Any): Any =
    new GenericArrayData(TextKernels.hashEmbed(t.toString, b.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, b) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.text.TextKernels.hashEmbed($t.toString(), $b))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HashEmbed =
    copy(left = l, right = r)
}

case class SimHash64(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(s: Any): Any = TextKernels.simhash64(s.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.text.TextKernels.simhash64($s.toString())")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

case class RollingFingerprint(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "doc_fingerprint"
  override protected def nullSafeEval(s: Any): Any = TextKernels.rollingFingerprint(s.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.text.TextKernels.rollingFingerprint($s.toString())")
  override protected def withNewChildInternal(c: Expression): RollingFingerprint = copy(child = c)
}

case class LangId(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_id"
  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(TextKernels.langId(s.toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.text.TextKernels.langId($s.toString()))")
  override protected def withNewChildInternal(c: Expression): LangId = copy(child = c)
}

/** shingle_overlap(a, b, n) → array<int>[intersection, union]. */
case class ShingleOverlap(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType, StringType, IntegerType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_overlap"
  override protected def nullSafeEval(a: Any, b: Any, n: Any): Any = {
    val (i, u) = TextKernels.shingleOverlap(a.toString, b.toString, n.asInstanceOf[Int])
    new GenericArrayData(Array(i, u))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, n) =>
      s"graft.text.TextExprHelpers.shingleOverlap($a.toString(), $b.toString(), $n)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): ShingleOverlap =
    copy(first = f, second = s, third = t)
}

/** char_shingles(text, n) → array<long>: sorted distinct FNV64 hashes of
  * the n-char shingles (the shingle_overlap set, materialized once per
  * document instead of once per candidate pair). */
case class CharShingles(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_shingles"
  override protected def nullSafeEval(s: Any, n: Any): Any =
    new GenericArrayData(TextKernels.charShingleHashes(s.toString, n.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.text.TextKernels.charShingleHashes($s.toString(), $n))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CharShingles =
    copy(left = l, right = r)
}

/** sorted_overlap(a, b) → array<int>[intersection, union] of two SORTED
  * distinct long arrays (one linear merge — the shingle_overlap math
  * over precomputed char_shingles sets). */
case class SortedOverlap(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_overlap"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextExprHelpers.sortedOverlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.text.TextExprHelpers.sortedOverlap($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedOverlap =
    copy(left = l, right = r)
}

/** rademacher_sig(embedding array<float|double>, nBits, seed) → long. */
case class RademacherSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(ArrayType(DoubleType), IntegerType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rademacher_sig"
  override protected def nullSafeEval(v: Any, n: Any, seed: Any): Any =
    TextKernels.rademacherSig(v.asInstanceOf[ArrayData].toDoubleArray(), n.asInstanceOf[Int], seed.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, n, seed) =>
      s"graft.text.TextKernels.rademacherSig($v.toDoubleArray(), $n, $seed)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): RademacherSig =
    copy(first = f, second = s, third = t)
}

/** word_ngrams(text, n) → sorted distinct array<long> of word-n-gram
  * FNV hashes (TextKernels.wordNgramHashes). */
case class WordNgramHashes(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"
  override protected def nullSafeEval(t: Any, n: Any): Any =
    new GenericArrayData(TextKernels.wordNgramHashes(t.toString, n.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.text.TextKernels.wordNgramHashes($t.toString(), $n))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): WordNgramHashes =
    copy(left = l, right = r)
}

/** repetition_stats(text) → array<int>[totalWords, distinctWords,
  * topWordCount, totalBigrams, topBigramCount]. */
case class RepetitionStats(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "repetition_stats"
  override protected def nullSafeEval(s: Any): Any =
    new GenericArrayData(TextKernels.repetitionStats(s.toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.text.TextKernels.repetitionStats($s.toString()))")
  override protected def withNewChildInternal(c: Expression): RepetitionStats = copy(child = c)
}

/** gopher_stats(text) → array<int> of the nine exact Gopher rule counters
  * (see TextKernels.gopherStats). */
case class GopherStats(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gopher_stats"
  override protected def nullSafeEval(s: Any): Any =
    new GenericArrayData(TextKernels.gopherStats(s.toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.text.TextKernels.gopherStats($s.toString()))")
  override protected def withNewChildInternal(c: Expression): GopherStats = copy(child = c)
}

/** ngram_hits(text, n) against a driver-collected, broadcast benchmark
  * gram set → array<int>[matchedGrams, totalGrams]. The broadcast handle
  * rides the expression (the GcpPolyEval pattern): tasks fetch the sorted
  * bench array once from the block manager, then every row is a
  * shuffle-free binary-search probe inside whole-stage codegen. */
case class NgramHitCount(left: Expression, right: Expression,
                         bench: org.apache.spark.broadcast.Broadcast[Array[Long]])
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ngram_hits"
  override protected def nullSafeEval(t: Any, n: Any): Any =
    TextExprHelpers.ngramHits(t.toString, n.asInstanceOf[Int], bench.value)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("benchGrams", bench, "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.text.TextExprHelpers.ngramHits($t.toString(), $n, (long[]) $ref.value())")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NgramHitCount =
    copy(left = l, right = r)
}

object TextExprHelpers {
  def ngramHits(text: String, n: Int, bench: Array[Long]): ArrayData = {
    val grams = TextKernels.wordNgramHashes(text, n)
    new GenericArrayData(Array(TextKernels.sortedHitCount(grams, bench), grams.length))
  }

  def shingleOverlap(a: String, b: String, n: Int): ArrayData = {
    val (i, u) = TextKernels.shingleOverlap(a, b, n)
    new GenericArrayData(Array(i, u))
  }

  def sortedOverlap(a: ArrayData, b: ArrayData): ArrayData = {
    val la = a.numElements(); val lb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < la && j < lb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    new GenericArrayData(Array(inter, la + lb - inter))
  }
}

/** Column facade. */
object textfunctions {
  def fnv64(c: Column): Column = toCol(Fnv64(toExpr(c)))
  def sample_bucket(c: Column): Column = toCol(SampleBucket(toExpr(c)))
  def smix64(c: Column): Column = toCol(Smix64(toExpr(c)))
  def smix64_add(x: Column, c: Long): Column = toCol(Smix64Add(toExpr(x), Literal(c)))
  def smix64_add(x: Column, c: Column): Column = toCol(Smix64Add(toExpr(x), toExpr(c)))
  def minhash_sig(text: Column, k: Int, shingle: Int): Column =
    toCol(MinHashSig(toExpr(text), Literal(k), Literal(shingle)))
  def simhash64(c: Column): Column = toCol(SimHash64(toExpr(c)))
  def hash_embed(text: Column, buckets: Int): Column =
    toCol(HashEmbed(toExpr(text), Literal(buckets)))
  def doc_fingerprint(c: Column): Column = toCol(RollingFingerprint(toExpr(c)))
  def lang_id(c: Column): Column = toCol(LangId(toExpr(c)))
  def shingle_overlap(a: Column, b: Column, n: Int): Column =
    toCol(ShingleOverlap(toExpr(a), toExpr(b), Literal(n)))
  def char_shingles(text: Column, n: Int): Column =
    toCol(CharShingles(toExpr(text), Literal(n)))
  def sorted_overlap(a: Column, b: Column): Column =
    toCol(SortedOverlap(toExpr(a), toExpr(b)))
  def rademacher_sig(v: Column, nBits: Int, seed: Long): Column =
    toCol(RademacherSig(toExpr(v), Literal(nBits), Literal(seed)))
  def word_ngrams(text: Column, n: Int): Column =
    toCol(WordNgramHashes(toExpr(text), Literal(n)))
  def repetition_stats(c: Column): Column = toCol(RepetitionStats(toExpr(c)))

  def gopher_stats(c: Column): Column = toCol(GopherStats(toExpr(c)))
  def ngram_hits(text: Column, n: Int,
                 bench: org.apache.spark.broadcast.Broadcast[Array[Long]]): Column =
    toCol(NgramHitCount(toExpr(text), Literal(n), bench))
}
