package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Hll
import graft.text.TextKernels

/** HLL distinct sketch (q166): register parity with a driver-side
  * reference, partitioning invariance, and estimate sanity. */
class HllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refRegisters(hashes: Seq[Long], p: Int): Array[Int] = {
    val m = 1 << p
    val regs = new Array[Int](m)
    hashes.foreach { h =>
      val bucket = (h >>> (64 - p)).toInt
      val w = ((h >>> (64 - p - 20)) & 0xFFFFF).toInt
      val rho = 21 - (32 - Integer.numberOfLeadingZeros(w))
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    regs
  }

  private val hashes: Seq[Long] =
    (1 to 20000).map(i => TextKernels.splitmix64((i % 7001).toLong)) // 7001 distinct

  test("registers match the driver-side reference bit-for-bit") {
    val df = hashes.toDF("h").withColumn("grp", lit(0L))
    val got = Hll.registers(df, Seq("grp"), "h", p = 8).collect()
    assert(got.length == 1)
    assert(got(0).getAs[scala.collection.Seq[Int]]("regs").toSeq == refRegisters(hashes, 8).toSeq)
  }

  test("partitioning invariance: 1 vs 13 partitions, same registers") {
    val df = hashes.toDF("h").withColumn("grp", pmod(col("h"), lit(3)))
    val a = Hll.registers(df.repartition(1), Seq("grp"), "h", p = 8)
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Int]]("regs").toSeq).toMap
    val b = Hll.registers(df.repartition(13), Seq("grp"), "h", p = 8)
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Int]]("regs").toSeq).toMap
    assert(a == b)
  }

  test("estimate lands within HLL error bounds; fingerprint/zeros/S exact") {
    val df = hashes.toDF("h").withColumn("grp", lit(0L))
    val row = Hll.withEstimate(Hll.registers(df, Seq("grp"), "h", p = 8), p = 8)
      .collect()(0)
    val regs = refRegisters(hashes, 8)
    assert(row.getAs[Int]("zeros") == regs.count(_ == 0))
    assert(row.getAs[Long]("reg_fp") ==
      regs.zipWithIndex.map { case (r, i) => r.toLong * (i + 1) }.sum)
    val s = regs.map(r => 1L << (21 - r)).sum
    assert(row.getAs[Long]("s_scaled") == s)
    val est = row.getAs[Double]("est")
    // sigma ≈ 1.04/sqrt(256) = 6.5%; allow 4 sigma on one draw
    assert(math.abs(est - 7001.0) / 7001.0 < 0.26, s"est=$est")
  }

  test("small-range branch: est switches to linear counting and tracks tiny cardinalities") {
    val small = (1 to 500).map(i => TextKernels.splitmix64((i % 37).toLong)) // 37 distinct
    val row = Hll.withEstimate(
      Hll.registers(small.toDF("h").withColumn("grp", lit(0L)), Seq("grp"), "h", p = 8),
      p = 8).collect()(0)
    val zeros = row.getAs[Int]("zeros")
    assert(zeros > 0 && row.getAs[Double]("est_raw") <= 640.0, "fixture sits in the LC regime")
    assert(row.getAs[Double]("est") == 256.0 * math.log(256.0 / zeros),
      "est is the lcTable lookup, bit-exact")
    assert(math.abs(row.getAs[Double]("est") - 37.0) / 37.0 < 0.25,
      s"linear counting tracks small n (est=${row.getAs[Double]("est")})")
  }

  test("minhashCandidatesFromSigs fails loudly on a signature-length mismatch") {
    val bad = Seq((1L, Array(1L, 2L, 3L)), (2L, Array(4L, 5L, 6L))).toDF("id", "sig")
    val e = intercept[Exception] {
      graft.ops.Dedup.minhashCandidatesFromSigs(bad, k = 64, bands = 16).count()
    }
    assert(e.getMessage != null)
    graft.pipeline.Caches.release()
    assertThrows[IllegalArgumentException] {
      graft.ops.Dedup.minhashCandidatesFromSigs(bad, k = 64, bands = 15)
    }
  }
}
