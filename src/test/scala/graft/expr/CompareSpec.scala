package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.{GdalChecksum, ImageCodec, Raster}
import graft.expr.functions._

/** raster_compare (gdalcompare analog) + raster_xyz (gdal2xyz analog). */
class CompareSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def raster(seed: Int, w: Int, h: Int, nBands: Int): Raster = {
    val b = Array.fill(nBands)(Array.tabulate(w * h)(i => ((i * 7) + seed) % 256))
    Raster(w, h, b)
  }

  test("identical rasters compare clean: zero diffs, zero found_diff") {
    val r = raster(3, 8, 8, 1)
    val bytes = ImageCodec.encode(r, "raw")
    val df = Seq((bytes, bytes)).toDF("a", "b")
      .select(raster_compare(col("a"), lit("raw"), lit(8), lit(8),
        col("b"), lit("raw"), lit(8), lit(8)).as("c"))
      .select("c.*")
    val row = df.head
    assert(row.getAs[Long]("diff_count") == 0L)
    assert(row.getAs[Int]("max_diff") == 0)
    assert(row.getAs[Long]("sse") == 0L)
    assert(row.getAs[Int]("found_diff") == 0)
    assert(row.getAs[Int]("checksum_a") == row.getAs[Int]("checksum_b"))
    assert(row.getAs[Int]("checksum_a") == GdalChecksum.ofInts(r.bands(0), 8, 8))
  }

  test("differing rasters: per-band found_diff, exact diff stats") {
    val ra = raster(0, 4, 4, 3)
    val rb = raster(5, 4, 4, 3) // every pixel +5 (no mod wrap for these values)
    val df = Seq((ImageCodec.encode(ra, "raw"), ImageCodec.encode(rb, "raw")))
      .toDF("a", "b")
      .select(raster_compare(col("a"), lit("raw"), lit(4), lit(4),
        col("b"), lit("raw"), lit(4), lit(4)).as("c"))
      .select("c.*")
    val row = df.head
    // hand-check: values differ everywhere by |5| except where mod-256 wraps
    val diffs = ra.bands(0).zip(rb.bands(0)).map { case (x, y) => x - y }
    assert(row.getAs[Long]("diff_count") == diffs.count(_ != 0).toLong)
    assert(row.getAs[Int]("max_diff") == diffs.map(math.abs).max)
    assert(row.getAs[Long]("sse") == diffs.map(d => d.toLong * d).sum)
    // 3 shared bands, each checksum differs -> found_diff = 3
    assert(row.getAs[Int]("found_diff") == 3)
  }

  test("band-count mismatch adds one structural diff") {
    val ra = raster(0, 4, 4, 1)
    val rb = raster(0, 4, 4, 3)
    val row = Seq((ImageCodec.encode(ra, "raw"), ImageCodec.encode(rb, "raw")))
      .toDF("a", "b")
      .select(raster_compare(col("a"), lit("raw"), lit(4), lit(4),
        col("b"), lit("raw"), lit(4), lit(4)).as("c"))
      .select("c.*").head
    // same band-0 content: structural band mismatch only
    assert(row.getAs[Int]("found_diff") == 1)
    assert(row.getAs[Long]("diff_count") == 0L)
  }

  test("raster_xyz georeferences pixel centers and skips nodata") {
    val r = Raster(2, 2, Array(Array(0, 10, 20, 30))) // band0: (0,0)=0 skipped
    val meta = array(lit(2.0), lit(2.0), lit(4326.0),
      lit(100.0), lit(0.5), lit(0.0), lit(40.0), lit(0.0), lit(-0.25))
    val rows = Seq(ImageCodec.encode(r, "raw")).toDF("bytes")
      .select(explode(raster_xyz(col("bytes"), lit("raw"), meta, lit(0))).as("p"))
      .select("p.*").collect().map(r =>
        (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3), r.getInt(4)))
    assert(rows.length == 3) // nodata pixel dropped
    // px=1, py=0 -> gx = 100 + 1.5*0.5, gy = 40 + 0.5*(-0.25)
    assert(rows.contains((1, 0, 100.75, 39.875, 10)))
    assert(rows.contains((0, 1, 100.25, 39.625, 20)))
    assert(rows.contains((1, 1, 100.75, 39.625, 30)))
  }

  test("raster_chips emits every full strided window with exact stats") {
    val r = raster(5, 16, 16, 1)
    val chips = Seq(ImageCodec.encode(r, "raw")).toDF("bytes")
      .select(explode(raster_chips(col("bytes"), lit("raw"),
        array(lit(16.0), lit(16.0), lit(0.0),
          lit(0.0), lit(1.0), lit(0.0), lit(0.0), lit(0.0), lit(1.0)),
        lit(8), lit(4))).as("c"))
      .select("c.*").collect()
      .map(x => (x.getInt(0), x.getInt(1), x.getInt(2), x.getLong(3)))
    assert(chips.length == 9) // (16-8)/4+1 = 3 per axis
    // chip (1,2) hand replay
    val (cx, cy) = (1, 2)
    val vals = for (oy <- 0 until 8; ox <- 0 until 8)
      yield r.bands(0)((cy * 4 + oy) * 16 + (cx * 4 + ox))
    val exp = chips.find(c => c._1 == cx && c._2 == cy).get
    assert(exp._4 == vals.map(_.toLong).sum)
    assert(exp._3 == GdalChecksum.ofInts(vals.toArray, 8, 8))
  }

  test("raster_xyz with out-of-range nodata keeps every pixel") {
    val r = raster(9, 5, 3, 1)
    val n = Seq(ImageCodec.encode(r, "raw")).toDF("bytes")
      .select(explode(raster_xyz(col("bytes"), lit("raw"),
        array(lit(5.0), lit(3.0), lit(0.0),
          lit(0.0), lit(1.0), lit(0.0), lit(0.0), lit(0.0), lit(1.0)), lit(-1))).as("p"))
      .count()
    assert(n == 15L)
  }
}
