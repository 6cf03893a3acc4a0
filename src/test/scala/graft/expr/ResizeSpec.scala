package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.{GdalChecksum, ImageCodec, Raster}
import graft.expr.functions._

/** raster_resize (area downsample + center crop) and raster_moments
  * (single-decode exact pixel moments). */
class ResizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def resize(r: Raster, k: Int): org.apache.spark.sql.Row = {
    val bytes = ImageCodec.encode(r, "raw")
    Seq(Tuple1(bytes)).toDF("b")
      .select(raster_resize(col("b"), lit("raw"), lit(r.w), lit(r.h), lit(k)).as("r"))
      .select("r.*").head
  }

  test("constant image: resize preserves the value; crop checksum = constant plane checksum") {
    val r = Raster(16, 16, Array(Array.fill(256)(77)))
    val m = resize(r, 4)
    assert(m.getAs[Int]("rw") == 4)
    assert(m.getAs[Long]("sum_resized") == 16L * 77)
    assert(m.getAs[Int]("cks_resized") == GdalChecksum.ofInts(Array.fill(16)(77), 4, 4))
    assert(m.getAs[Int]("cks_crop") == GdalChecksum.ofInts(Array.fill(64)(77), 8, 8))
  }

  test("block means round half up on the exact integer sum") {
    // one 4x4 block of a 4x4 image: fifteen 0s and one 8 → mean 0.5 → rounds to 1
    val b = new Array[Int](16); b(5) = 8
    val m = resize(Raster(4, 4, Array(b)), 4)
    assert(m.getAs[Int]("rw") == 1)
    assert(m.getAs[Long]("sum_resized") == 1L)
    // fourteen 0s and two 4s → sum 8 → (8+8)/16 = 1; sum 7 → (7+8)/16 = 0
    val b2 = new Array[Int](16); b2(1) = 4; b2(9) = 4
    assert(resize(Raster(4, 4, Array(b2)), 4).getAs[Long]("sum_resized") == 1L)
    val b3 = new Array[Int](16); b3(1) = 4; b3(9) = 3
    assert(resize(Raster(4, 4, Array(b3)), 4).getAs[Long]("sum_resized") == 0L)
  }

  test("crop window is the central half at the exact (s/4, s/4) origin") {
    val w = 16
    val b = Array.tabulate(w * w)(i => (i % w) * 11 + (i / w) * 3)
    val m = resize(Raster(w, w, Array(b)), 4)
    val crop = Array.tabulate(8 * 8)(i => b((4 + i / 8) * w + (4 + i % 8)))
    assert(m.getAs[Int]("cks_crop") == GdalChecksum.ofInts(crop, 8, 8))
    // hand-computed area downsample of the same plane
    val rz = Array.tabulate(4 * 4) { i =>
      val (bx, by) = (i % 4, i / 4)
      var acc = 0L
      for (dy <- 0 until 4; dx <- 0 until 4) acc += b((by * 4 + dy) * w + (bx * 4 + dx))
      ((acc + 8) / 16).toInt
    }
    assert(m.getAs[Int]("cks_resized") == GdalChecksum.ofInts(rz, 4, 4))
    assert(m.getAs[Long]("sum_resized") == rz.map(_.toLong).sum)
  }

  test("non-square or non-divisible frames yield null (loader contract: fail closed)") {
    val bytes = ImageCodec.encode(Raster(6, 6, Array(Array.fill(36)(1))), "raw")
    val out = Seq(Tuple1(bytes)).toDF("b")
      .select(raster_resize(col("b"), lit("raw"), lit(6), lit(6), lit(4)).as("r")).head
    assert(out.isNullAt(0))
  }

  test("raster_moments: exact n/sum/sum2/min/max in one pass") {
    val b = Array.tabulate(64)(i => (i * 29 + 5) % 251)
    val bytes = ImageCodec.encode(Raster(8, 8, Array(b)), "raw")
    val m = Seq(Tuple1(bytes)).toDF("b")
      .select(raster_moments(col("b"), lit("raw"), lit(8), lit(8)).as("m"))
      .select("m.*").head
    assert(m.getAs[Long]("n_px") == 64L)
    assert(m.getAs[Long]("v_sum") == b.map(_.toLong).sum)
    assert(m.getAs[Long]("v_sum2") == b.map(v => v.toLong * v).sum)
    assert(m.getAs[Int]("v_min") == b.min && m.getAs[Int]("v_max") == b.max)
  }
}
