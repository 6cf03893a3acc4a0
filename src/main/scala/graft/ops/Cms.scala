package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.text.textfunctions.smix64_add

/** Count-Min sketch — approximate frequencies / heavy-hitter detection
  * (Cormode–Muthukrishnan). The operational companion to [[Hll]]: before
  * salting a join key, a 100 TB run asks "which keys are hot and HOW
  * hot" — exact groupBy(key).count() shuffles the full key set; the CMS
  * answers from a d×w counter matrix that never leaves one aggregate
  * buffer.
  *
  * Row r hashes x to bucket splitmix64(x + r·golden) & (w−1) — the
  * epoch-shuffle seeding pattern, already SQL-mirrored bit-exactly
  * elsewhere (w a power of two so the unsigned residue is the masked
  * low bits). Point estimate = min over rows of the probed counter:
  * an OVERCOUNT bound (est ≥ true always; collisions only add).
  *
  * Every counter is an exact int64 — unlike t-digest/HLL-raw there is
  * no float anywhere, so oracles replay the sketch verbatim.
  *
  * Scale shape: partial-aggregate state is one d·w long array per task
  * (8 KiB at 4×256) merged by elementwise SUM — commutative/associative,
  * so shuffle order and AQE cannot change a counter; ONE buffer row per
  * task crosses the Exchange regardless of corpus size.
  */
class CmsAgg(d: Int, w: Int) extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {
  require(d >= 1 && d <= 16, s"CMS depth in [1,16], got $d")
  require(w >= 2 && (w & (w - 1)) == 0, s"CMS width must be a power of two, got $w")
  require(d.toLong * w <= (1 << 28), s"CMS matrix d*w=$d*$w too large for one buffer")

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var r = 0
    while (r < d) {
      val b = (graft.text.TextKernels.splitmix64(x + r * Cms.Golden) & (w - 1)).toInt
      buf(r * w + b) += 1
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object Cms {
  /** Same 32-bit golden-ratio constant the epoch shuffle seeds with. */
  val Golden: Long = 0x9E3779B9L

  /** One CMS matrix over the hashed items of `hashCol` (already a 64-bit
    * hash, e.g. fnv64(word)) per group — `m` is the flattened d×w
    * counter array. */
  def sketch(df: DataFrame, grpCols: Seq[String], hashCol: String,
             d: Int = 4, w: Int = 256): DataFrame = {
    val agg = udaf(new CmsAgg(d, w))
    // groupBy() with zero columns IS the global aggregate
    df.groupBy(grpCols.map(col): _*).agg(agg(col(hashCol)).as("m"))
  }

  /** Point-estimate column: min over the d probed counters of `xCol`
    * (a 64-bit hash) against matrix column `mCol`. The seed addition
    * runs inside smix64_add (JVM, wrapping) — a Catalyst `x + c` would
    * throw on overflow under Spark 4's default ANSI mode for hashes
    * near Long.MaxValue, diverging from CmsAgg.reduce's wrap. */
  def estimate(mCol: Column, xCol: Column, d: Int = 4, w: Int = 256): Column =
    (0 until d).map { r =>
      element_at(mCol,
        (smix64_add(xCol, r * Golden).bitwiseAND(lit((w - 1).toLong)) + lit(r * w) + lit(1))
          .cast("int"))
    }.reduceLeft(least(_, _))
}
