package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.{GdalChecksum, ImageCodec, Raster}
import graft.expr.functions._

/** raster_scale — the gdal_translate -scale / -exponent band rescale. */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scale(r: Raster, a: Int, b: Int, c: Int, d: Int, e: Int): org.apache.spark.sql.Row = {
    val bytes = ImageCodec.encode(r, "raw")
    Seq(Tuple1(bytes)).toDF("b")
      .select(raster_scale(col("b"), lit("raw"), lit(r.w), lit(r.h),
        lit(a), lit(b), lit(c), lit(d), lit(e)).as("s"))
      .select("s.*").head
  }

  test("linear: endpoints map to endpoints, midpoint rounds half up") {
    // [0,100] -> [0,10]: v=0->0, v=100->10, v=5 -> 0.5 -> 1 (half up), v=4 -> 0
    val b = Array.fill(16)(0) ++ Array.fill(16)(100) ++ Array.fill(16)(5) ++ Array.fill(16)(4)
    val m = scale(Raster(8, 8, Array(b)), 0, 100, 0, 10, 1)
    assert(m.getAs[Long]("sum_scaled") == 16L * 0 + 16L * 10 + 16L * 1 + 16L * 0)
    assert(m.getAs[Long]("n_clip_lo") == 0L && m.getAs[Long]("n_clip_hi") == 0L)
  }

  test("values outside the src range clip to the endpoints and are counted") {
    val b = Array.fill(32)(10) ++ Array.fill(32)(240) // src [32,224]
    val m = scale(Raster(8, 8, Array(b)), 32, 224, 10, 200, 1)
    // 10 < 32 -> clamps to x=0 -> out 10; 240 > 224 -> x=192 -> out 200
    assert(m.getAs[Long]("sum_scaled") == 32L * 10 + 32L * 200)
    assert(m.getAs[Long]("n_clip_lo") == 32L && m.getAs[Long]("n_clip_hi") == 32L)
    assert(m.getAs[Int]("cks_scaled") ==
      GdalChecksum.ofInts(Array.fill(32)(10) ++ Array.fill(32)(200), 8, 8))
  }

  test("exponent 2: quadratic law on the normalized ratio, exact rounding") {
    // [0,255]->[0,100], e=2: v=255 -> 100; v=51 (ratio .2) -> 4; v=128 -> round(100*128^2/65025)=25
    val b = Array.fill(16)(255) ++ Array.fill(16)(51) ++ Array.fill(16)(128) ++ Array.fill(16)(0)
    val m = scale(Raster(8, 8, Array(b)), 0, 255, 0, 100, 2)
    assert(m.getAs[Long]("sum_scaled") == 16L * 100 + 16L * 4 + 16L * 25 + 0L)
  }

  test("degenerate ranges and out-of-contract exponents fail closed (null)") {
    val bytes = ImageCodec.encode(Raster(4, 4, Array(Array.fill(16)(1))), "raw")
    def run(a: Int, b: Int, e: Int) = Seq(Tuple1(bytes)).toDF("b")
      .select(raster_scale(col("b"), lit("raw"), lit(4), lit(4),
        lit(a), lit(b), lit(0), lit(10), lit(e)).as("s")).head
    assert(run(100, 100, 1).isNullAt(0)) // zero-width src range
    assert(run(0, 255, 4).isNullAt(0))   // exponent beyond the exact-int64 contract
  }
}
