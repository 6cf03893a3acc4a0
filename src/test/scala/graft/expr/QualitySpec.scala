package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.{ImageCodec, Raster}
import graft.expr.functions._

/** raster_quality — per-image curation signals (blur/exposure/clipping). */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def metrics(r: Raster): org.apache.spark.sql.Row = {
    val bytes = ImageCodec.encode(r, "raw")
    Seq(Tuple1(bytes)).toDF("b")
      .select(raster_quality(col("b"), lit("raw"), lit(r.w), lit(r.h)).as("q"))
      .select("q.*").head
  }

  test("constant image: zero Laplacian energy, exact exposure moments") {
    val r = Raster(8, 8, Array(Array.fill(64)(100)))
    val m = metrics(r)
    assert(m.getAs[Long]("n_int") == 36L)
    assert(m.getAs[Long]("lap_sum") == 0L && m.getAs[Long]("lap_sum2") == 0L)
    assert(m.getAs[Long]("v_sum") == 6400L && m.getAs[Long]("v_sum2") == 640000L)
    assert(m.getAs[Long]("n_lo") == 0L && m.getAs[Long]("n_hi") == 0L)
  }

  test("checkerboard maximizes Laplacian energy; clipping counts both tails") {
    val b = Array.tabulate(64)(i => if ((i % 8 + i / 8) % 2 == 0) 0 else 255)
    val m = metrics(Raster(8, 8, Array(b)))
    // interior: |L| = 4*255 exactly at every cell, sign alternating
    assert(m.getAs[Long]("lap_sum2") == 36L * 1020L * 1020L)
    assert(math.abs(m.getAs[Long]("lap_sum")) == 0L) // 18 pos + 18 neg cells cancel
    assert(m.getAs[Long]("n_lo") == 32L && m.getAs[Long]("n_hi") == 32L)
  }

  test("raster_augment: checksums match hand-remapped views; group identities hold") {
    val w = 8
    val b = Array.tabulate(w * w)(i => (i * 37 + 11) % 256) // asymmetric
    val bytes = ImageCodec.encode(Raster(w, w, Array(b)), "raw")
    val m = Seq(Tuple1(bytes)).toDF("b")
      .select(raster_augment(col("b"), lit("raw"), lit(w), lit(w)).as("a"))
      .select("a.*").head
    def view(sx: (Int, Int) => Int, sy: (Int, Int) => Int): Array[Int] =
      Array.tabulate(w * w)(i => b(sy(i % w, i / w) * w + sx(i % w, i / w)))
    assert(m.getAs[Int]("cks_id") == graft.core.GdalChecksum.ofInts(b, w, w))
    assert(m.getAs[Int]("cks_fh") ==
      graft.core.GdalChecksum.ofInts(view((x, _) => w - 1 - x, (_, y) => y), w, w))
    assert(m.getAs[Int]("cks_r90") ==
      graft.core.GdalChecksum.ofInts(view((_, y) => y, (x, _) => w - 1 - x), w, w))
    // group identity: rot180 = flip_h ∘ flip_v
    val fhfv = view((x, _) => w - 1 - x, (_, y) => w - 1 - y)
    assert(m.getAs[Int]("cks_r180") == graft.core.GdalChecksum.ofInts(fhfv, w, w))
    // a horizontally symmetric image is fixed by flip_h
    val sym = Array.tabulate(w * w)(i => math.min(i % w, w - 1 - i % w) * 30)
    val symB = ImageCodec.encode(Raster(w, w, Array(sym)), "raw")
    val ms = Seq(Tuple1(symB)).toDF("b")
      .select(raster_augment(col("b"), lit("raw"), lit(w), lit(w)).as("a"))
      .select("a.*").head
    assert(ms.getAs[Int]("cks_fh") == ms.getAs[Int]("cks_id"))
  }

  test("a blurred gradient scores below a sharp edge (the filter's ordering)") {
    val sharp = Array.tabulate(64)(i => if (i % 8 < 4) 0 else 200)
    val smooth = Array.tabulate(64)(i => (i % 8) * 25)
    val ms = metrics(Raster(8, 8, Array(sharp)))
    val mm = metrics(Raster(8, 8, Array(smooth)))
    def varLap(m: org.apache.spark.sql.Row): Double = {
      val n = m.getAs[Long]("n_int").toDouble
      (n * m.getAs[Long]("lap_sum2") - math.pow(m.getAs[Long]("lap_sum").toDouble, 2)) / (n * n)
    }
    assert(varLap(ms) > varLap(mm))
    assert(varLap(mm) == 0.0) // a perfect linear ramp has zero Laplacian
  }
}
