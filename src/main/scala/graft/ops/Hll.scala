package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (SURVEY.md §2.4 "approx distinct" —
  * absent in the reference's OGR SQL, which keeps exact sets
  * (ogr_swq.h:382-383); engine-native here because a 100 TB curation run
  * monitors cardinalities (distinct tokens, distinct shingles, distinct
  * cells per partition) where exact COUNT(DISTINCT) would shuffle the
  * full value set).
  *
  * Design (Flajolet et al., HLL): bucket = top `p` bits of the 64-bit
  * mixed hash; rho = 1 + leading zeros of the NEXT 20 bits (capped at
  * 21); register = max rho per bucket. The 20-bit rho window is the
  * deliberate deviation from textbook HLL's "all remaining bits": it
  * bounds every register at 21, which makes the harmonic denominator
  * S = Σ_j 2^(21 − M_j) an EXACT int64 (≤ m·2^21) — so the whole sketch,
  * and everything the estimate is derived from, is integer-exact and
  * bit-replicable in an ANSI oracle. The cardinality ceiling this costs
  * is ~2^20 distinct values per bucket — 10^11+ overall at p = 8 —
  * irrelevant below the sketch's own error floor.
  *
  * Scale shape: partial-aggregate state is one m-byte array per group
  * per task (map-side combine), merge is elementwise max — commutative,
  * associative, idempotent, so shuffle order / retries / AQE cannot
  * change a register. ONE m-byte row per (group, task) crosses the
  * Exchange regardless of corpus size — the whole point vs exact
  * distinct.
  */
class HllAgg(p: Int) extends Aggregator[Long, Array[Byte], Array[Int]] with Serializable {
  require(p >= 4 && p <= 16, s"HLL precision p in [4,16], got $p")
  require(p + 20 <= 64, "rho window must fit below the bucket bits")
  private val m = 1 << p

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(buf: Array[Byte], h: Long): Array[Byte] = {
    val bucket = (h >>> (64 - p)).toInt
    val w = ((h >>> (64 - p - 20)) & 0xFFFFF).toInt
    // bit length of the 20-bit window; w == 0 → rho = 21 (all zeros)
    val rho = (21 - (32 - Integer.numberOfLeadingZeros(w))).toByte
    if (rho > buf(bucket)) buf(bucket) = rho
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Byte]): Array[Int] = buf.map(_.toInt)
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
}

object Hll {
  /** Registers per group: `df.groupBy(grpCols).agg(hll(h))`. `hashCol`
    * must already be a well-mixed 64-bit hash (smix64(fnv64(...))). */
  def registers(df: DataFrame, grpCols: Seq[String], hashCol: String, p: Int = 8): DataFrame = {
    val agg = udaf(new HllAgg(p))
    df.groupBy(grpCols.map(col): _*).agg(agg(col(hashCol)).as("regs"))
  }

  /** Linear-counting table: lcTable(z) = m · ln(m / z) for z = 1..m,
    * computed ONCE driver-side. Routing the only transcendental through
    * literal constants keeps the estimate bit-replicable in an oracle:
    * both engines look up the SAME double literal (shortest-round-trip
    * repr) instead of calling their own ln. */
  private[graft] def lcTable(m: Int): Array[Double] =
    (1 to m).map(z => m.toDouble * math.log(m.toDouble / z.toDouble)).toArray

  /** Derives the integer-exact summary + the HLL estimate from a `regs`
    * column: zeros (empty buckets), reg_fp (position-weighted register
    * fingerprint — pins all m registers bit-exactly), s_scaled =
    * Σ 2^(21−reg) (exact int64), est_raw = alpha_m · m² · 2²¹ / S (ONE
    * double division over exact integers), and est = the standard
    * small-range correction: linear counting m·ln(m/zeros) when
    * est_raw ≤ 2.5m and zeros > 0 (via [[lcTable]] so the branch is
    * still engine-exact), est_raw otherwise. */
  def withEstimate(regs: DataFrame, p: Int = 8): DataFrame = {
    val m = 1 << p
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    // powers[i+1] = 2^i (element_at is 1-based); term for register r is 2^(21-r)
    val powers = (0 to 21).map(i => 1L << i).toArray
    regs
      .withColumn("zeros", size(filter(col("regs"), r => r === 0)))
      .withColumn("reg_fp", aggregate(
        zip_with(col("regs"), sequence(lit(1), lit(m)), (r, i) => r.cast("long") * i.cast("long")),
        lit(0L), (acc, x) => acc + x))
      .withColumn("s_scaled", aggregate(
        col("regs"),
        lit(0L), (acc, r) => acc + element_at(typedlit(powers), lit(22) - r)))
      .withColumn("est_raw",
        alpha * lit(m.toDouble) * lit(m.toDouble) * lit(2097152.0) / col("s_scaled").cast("double"))
      .withColumn("est",
        when(col("zeros") > 0 && col("est_raw") <= lit(2.5 * m),
          element_at(typedlit(lcTable(m)), col("zeros")))
          .otherwise(col("est_raw")))
      .drop("regs")
  }
}
