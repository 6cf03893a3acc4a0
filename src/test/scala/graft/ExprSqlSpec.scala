package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{CellIndex, ImageCodec, TileMath}
import graft.expr.functions._
import graft.gen.Fixtures

class ExprSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("expressions are registered for spark.sql via extensions registry") {
    val r = spark.sql("SELECT cell_of(CAST(-117.64 AS DOUBLE), CAST(33.9 AS DOUBLE), 12) AS c, " +
      "quadkey(3, 3, 5) AS qk").collect()(0)
    assert(r.getAs[Long]("c") == CellIndex.cell(-117.64, 33.9, 12))
    assert(r.getAs[String]("qk") == "213")
  }

  test("cell_of stays inside whole-stage codegen") {
    val df = spark.range(100).select(cell_of(col("id").cast("double"), lit(0.0), 10).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" node prefix marks whole-stage-codegen membership
    assert(plan.contains("*(1) Project [cell_of"), plan)
    assert(df.distinct().count() > 1)
  }

  test("decode → stats/checksum/phash parity with the core library") {
    val rows = Fixtures.imagesFromParts(spark, TestSpark.Sf)
      .filter(col("fmt") =!= "jpeg") // lossless rows: bit-exact invariants
      .withColumn("stats", image_stats(col("bytes"), col("fmt"), col("w"), col("h")))
      .withColumn("ph", phash64(col("bytes"), col("fmt"), col("w"), col("h")))
      .select(col("key"), col("w"), col("fmt"), col("stats"), col("ph"), col("phash"))
      .collect()
    assert(rows.length > 50)
    rows.foreach { r =>
      val key = r.getAs[Long]("key")
      val w = r.getAs[Int]("w")
      val raster = Fixtures.patternRaster(key, w, w, 1)
      val stats = r.getAs[scala.collection.Seq[Double]]("stats")
      assert(stats(4).toInt == graft.core.GdalChecksum.ofInts(raster.bands(0), w, w),
        s"checksum mismatch for key=$key")
      assert(r.getAs[Long]("ph") == r.getAs[Long]("phash"), s"phash roundtrip for key=$key")
    }
  }

  test("jpeg rows clear the PSNR >= 40 dB lossy invariant (input_hint)") {
    val rows = Fixtures.imagesFromParts(spark, TestSpark.Sf)
      .filter(col("fmt") === "jpeg").limit(20)
      .select(col("key"), col("bytes"), col("w")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[Int]("w")
      val dec = ImageCodec.decode(r.getAs[Array[Byte]]("bytes"), "jpeg", w, w)
      val ref = Fixtures.patternRaster(r.getAs[Long]("key"), w, w, 3)
      val p = ImageCodec.psnr(ref, dec)
      assert(p >= 40.0, s"psnr $p for key ${r.getAs[Long]("key")}")
    }
  }

  test("caption exact-equality invariant survives the pipeline") {
    val df = Fixtures.imagesFromParts(spark, TestSpark.Sf)
    val bad = df.filter(!col("caption").startsWith(concat(lit("caption for "), col("image_id")))).count()
    assert(bad == 0)
  }

  test("tile_cover agrees with per-point tile_xy on point-sized envelopes") {
    val pts = Fixtures.pointsFromOrders(spark, TestSpark.Sf).limit(200)
      .withColumn("env", array(col("lon"), col("lat"), col("lon"), col("lat")))
      .withColumn("cover", tile_cover(col("env"), 8, 8))
      .withColumn("xy", tile_xy(col("lon"), col("lat"), 8))
    val bad = pts.filter(size(col("cover")) =!= 1
      || tile_x(col("cover")(0)) =!= col("xy")(0).cast("int")
      || tile_y(col("cover")(0)) =!= col("xy")(1).cast("int")).count()
    assert(bad == 0)
  }

  test("footprint matches core envelope for UTM rows") {
    val rows = Fixtures.imagesFromParts(spark, TestSpark.Sf).filter(col("srid") =!= 4326)
      .withColumn("env", footprint(col("gt"), col("w"), col("h"), col("srid")))
      .select(col("key"), col("srid"), col("env"), col("gt"), col("w")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gt = r.getAs[scala.collection.Seq[Double]]("gt").toArray
      val w = r.getAs[Int]("w")
      val env = r.getAs[scala.collection.Seq[Double]]("env")
      val expected = graft.expr.GeoKernels.footprint(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(gt), w, w, r.getAs[Int]("srid"))
      assert(env.toSeq == expected.toDoubleArray().toSeq)
      assert(env(0) >= -180 && env(2) <= 180 && env(1) >= -90 && env(3) <= 90)
    }
  }

  test("quadkey expression round-trips against TileMath for random tiles") {
    val df = spark.range(500).select(
      (col("id") % 8 + 1).cast("int").as("z"),
      (col("id") * 37 % 256).cast("int").as("x0"),
      (col("id") * 53 % 256).cast("int").as("y0"))
      .withColumn("x", col("x0") % expr("shiftleft(1, z)"))
      .withColumn("y", col("y0") % expr("shiftleft(1, z)"))
      .select(col("z"), col("x"), col("y"), quadkey(col("z"), col("x"), col("y")).as("qk"))
    df.collect().foreach { r =>
      assert(r.getAs[String]("qk") == TileMath.quadkey(r.getAs[Int]("z"), r.getAs[Int]("x"), r.getAs[Int]("y")))
    }
  }
}
