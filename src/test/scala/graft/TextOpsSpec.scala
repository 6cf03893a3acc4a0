package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Decontaminate
import graft.text.TextKernels

/** Decontamination + repetition-signal operators (q119/q120). */
class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("repetitionStats counts words, distinct words, top word/bigram exactly") {
    // "a b a b a": words=5 distinct=2 topWord(a)=3 bigrams=4 topBigram("a b")=2
    assert(TextKernels.repetitionStats("a b a b a").toSeq == Seq(5, 2, 3, 4, 2))
    assert(TextKernels.repetitionStats("x").toSeq == Seq(1, 1, 1, 0, 0))
    assert(TextKernels.repetitionStats("x  y").toSeq == Seq(2, 2, 1, 1, 1),
      "multi-space split matches the \\s+ tokenizer")
    assert(TextKernels.repetitionStats("z z z z").toSeq == Seq(4, 1, 4, 3, 3))
  }

  test("hashEmbed: bucket counts follow the unsigned fnv residue, sum = token count") {
    val v = TextKernels.hashEmbed("a b a  c", 64)
    assert(v.sum == 4L)
    assert(v((TextKernels.fnv1a64("a") & 63L).toInt) == 2L)
    assert(v((TextKernels.fnv1a64("b") & 63L).toInt) >= 1L)
    assert(TextKernels.hashEmbed("", 64).forall(_ == 0L))
    // an int_dot against a constant-1 vector recovers the token count
    val ones = Array.fill(64)(1L)
    val dot = v.zip(ones).map { case (a, b) => a * b }.sum
    assert(dot == 4L)
  }

  test("wordNgramHashes: count, dedup, and short-document collapse") {
    // 6 words, n=3 -> 4 grams, all distinct
    assert(TextKernels.wordNgramHashes("a b c d e f", 3).length == 4)
    // repeated gram collapses: "a b a b a" 3-grams = {aba, bab, aba} -> 2
    assert(TextKernels.wordNgramHashes("a b a b a", 3).length == 2)
    // shorter than n -> single full-sequence gram
    val short = TextKernels.wordNgramHashes("a b", 5)
    assert(short.length == 1 && short(0) == TextKernels.fnv1a64("a b"))
    // sorted ascending (binary-search contract)
    val hs = TextKernels.wordNgramHashes("q w e r t y u i o p", 2)
    assert(hs.toSeq == hs.toSeq.sorted)
  }

  test("decontaminate flags exactly the documents sharing a bench n-gram") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),   // contains "beta gamma delta"
      (2L, "one two three four five"),          // clean
      (3L, "zeta beta gamma delta eta"),        // same bench gram, middle
      (4L, "beta gamma other words here")       // 2-word overlap only -> clean
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "prefix beta gamma delta suffix")).toDF("doc_id", "text")
    val out = Decontaminate.flag(corpus, bench, n = 3)
      .orderBy("doc_id").as[(Long, Int, Int, Int)].collect()
    assert(out.map(r => (r._1, r._3, r._4)).toSeq ==
      Seq((1L, 1, 1), (2L, 0, 0), (3L, 1, 1), (4L, 0, 0)))
    assert(out.forall(_._2 == 3), "5 words -> 3 trigrams each")
  }

  test("broadcast-probe and distributed-join decontamination paths agree") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val a = Decontaminate.flag(corpus, bench, n = 3)
      .orderBy("doc_id").collect().toSeq
    val b = Decontaminate.flagJoin(corpus, bench, n = 3)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.exists(_.getInt(3) == 1),
      "fixture corpus shares some trigrams with the bench slice")
  }

  test("benchGrams guard fails fast past the cap, naming the fallback") {
    val bench = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val err = intercept[IllegalArgumentException] {
      Decontaminate.benchGrams(bench, "text", n = 3, maxGrams = 2)
    }
    assert(err.getMessage.contains("flagJoin"))
  }

  test("repetition_stats expression matches the kernel over the fixture") {
    import graft.text.textfunctions._
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet").limit(50)
    val viaExpr = docs.select(col("doc_id"), repetition_stats(col("text")).as("r"))
      .as[(Long, Seq[Int])].collect().toMap
    val viaKernel = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().map { case (id, t) => id -> TextKernels.repetitionStats(t).toSeq }.toMap
    assert(viaExpr == viaKernel)
  }

  test("gopher counters pin every rule input") {
    // [nWords, sumWordLen, nAlphaWords, nStopHits,
    //  nLines, nBulletLines, nEllipsisLines, nHash, nEllipsis]
    assert(TextKernels.gopherStats("").toSeq == Seq(0, 0, 0, 0, 1, 0, 0, 0, 0))
    val t = "the cat... sat\n- a bullet line...\n* another\nplain #tag line\n"
    val g = TextKernels.gopherStats(t)
    assert(g(0) == 12, "words")            // whitespace tokens
    assert(g(2) == 10, "alpha words")      // the '-' and '*' tokens aren't alpha
    assert(g(3) == 1, "stop hits: 'the'")
    assert(g(4) == 5, "lines: trailing newline keeps an empty 5th line")
    assert(g(5) == 2, "bullet lines: '- ' and '* '")
    assert(g(6) == 1, "one line ends with ...")
    assert(g(7) == 1, "one #")
    assert(g(8) == 2, "two non-overlapping ... occurrences")
    // overlapping ellipsis: '....' counts once (leftmost non-overlap)
    assert(TextKernels.gopherStats("a....")(8) == 1)
    assert(TextKernels.gopherStats("a......")(8) == 2)
  }
}
