package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import graft.core._

/** Raster comparison + pixel-dump expressions — the gdalcompare / gdal2xyz
  * utility analogs (§2.1 QA surface). Both CodegenFallback: per-row cost is
  * the decode, as with every raster kernel here.
  */

/** raster_compare(bytesA, fmtA, wA, hA, bytesB, fmtB, wB, hB) →
  * struct<nbands_a, nbands_b, checksum_a, checksum_b, diff_count, max_diff,
  * sse, found_diff>.
  *
  * Mirrors gdalcompare.py compare_band semantics
  * (swig/python/gdal-utils/osgeo_utils/gdalcompare.py:128-189): sizes and
  * band counts are compared first, then the per-band GDAL checksum; only a
  * checksum mismatch triggers the pixel sweep, which reports the count of
  * differing pixels and the max absolute difference
  * (gdalcompare.py:79-108). found_diff tallies one per structural mismatch
  * plus one per band whose checksums differ, as compare_db does. The
  * integer SSE over band 1 is an extension (exactly the PSNR numerator, so
  * callers can derive PSNR without a second decode); pixel stats cover band
  * 1 — the reference loops bands, but our fixture bands are replicas and
  * per-band structs would triple the row for no information.
  */
case class RasterCompare(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 8, "raster_compare(bytesA, fmtA, wA, hA, bytesB, fmtB, wB, hB)")
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, StringType, IntegerType, IntegerType,
        BinaryType, StringType, IntegerType, IntegerType)
  override def dataType: DataType = StructType(Seq(
    StructField("nbands_a", IntegerType, nullable = false),
    StructField("nbands_b", IntegerType, nullable = false),
    StructField("checksum_a", IntegerType, nullable = false),
    StructField("checksum_b", IntegerType, nullable = false),
    StructField("diff_count", LongType, nullable = false),
    StructField("max_diff", IntegerType, nullable = false),
    StructField("sse", LongType, nullable = false),
    StructField("found_diff", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "raster_compare"

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val wA = vals(2).asInstanceOf[Int]; val hA = vals(3).asInstanceOf[Int]
    val wB = vals(6).asInstanceOf[Int]; val hB = vals(7).asInstanceOf[Int]
    val a = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, wA, hA)
    val b = ImageCodec.decode(vals(4).asInstanceOf[Array[Byte]], vals(5).toString, wB, hB)
    var foundDiff = 0
    if (wA != wB || hA != hB) foundDiff += 1
    if (a.nBands != b.nBands) foundDiff += 1
    val shared = math.min(a.nBands, b.nBands)
    val csA = GdalChecksum.ofInts(a.bands(0), wA, hA)
    val csB = GdalChecksum.ofInts(b.bands(0), wB, hB)
    var band = 0
    while (band < shared) {
      if (GdalChecksum.ofInts(a.bands(band), wA, hA) !=
          GdalChecksum.ofInts(b.bands(band), wB, hB)) foundDiff += 1
      band += 1
    }
    // pixel sweep over band 1, the compare_image_pixels pass; only
    // meaningful when shapes agree (the reference bails on size mismatch)
    var diffCount = 0L; var maxDiff = 0; var sse = 0L
    if (wA == wB && hA == hB) {
      val pa = a.bands(0); val pb = b.bands(0)
      var i = 0
      val n = wA * hA
      while (i < n) {
        val d = pa(i) - pb(i)
        if (d != 0) {
          diffCount += 1L
          val ad = math.abs(d)
          if (ad > maxDiff) maxDiff = ad
          sse += d.toLong * d.toLong
        }
        i += 1
      }
    }
    InternalRow(a.nBands, b.nBands, csA, csB, diffCount, maxDiff, sse, foundDiff)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): RasterCompare =
    copy(children = newChildren)
}

/** raster_xyz(bytes, fmt, meta9, nodata) →
  * array<struct<px:int, py:int, gx:double, gy:double, v:int>> — one entry
  * per band-1 pixel whose value != nodata (pass a sentinel outside [0,255]
  * to keep all), georeferenced at the PIXEL CENTER:
  * gx = gt0 + (px+0.5)*gt1 + (py+0.5)*gt2 (gdal2xyz.py:196-197).
  * meta9 = [w, h, srid, gt0..gt5] as everywhere else. The nodata skip is
  * the reference's skip_nodata path (gdal2xyz.py:46,60). Emitted as an
  * array for explode() — the table-generating shape every raster→vector
  * op here uses, so Catalyst plans one decode per image and the explode
  * parallelizes downstream work per-pixel.
  */
case class RasterXyz(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 4, "raster_xyz(bytes, fmt, meta9, nodata)")
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, StringType, ArrayType(DoubleType), IntegerType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("px", IntegerType, nullable = false),
    StructField("py", IntegerType, nullable = false),
    StructField("gx", DoubleType, nullable = false),
    StructField("gy", DoubleType, nullable = false),
    StructField("v", IntegerType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "raster_xyz"

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val meta = vals(2).asInstanceOf[ArrayData].toDoubleArray()
    val w = meta(0).toInt; val h = meta(1).toInt
    val gt0 = meta(3); val gt1 = meta(4); val gt2 = meta(5)
    val gt3 = meta(6); val gt4 = meta(7); val gt5 = meta(8)
    val nodata = vals(3).asInstanceOf[Int]
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    val band = r.bands(0)
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](w * h)
    var py = 0
    while (py < h) {
      var px = 0
      while (px < w) {
        val v = band(py * w + px)
        if (v != nodata) {
          val cx = px + 0.5; val cy = py + 0.5
          val gx = gt0 + cx * gt1 + cy * gt2
          val gy = gt3 + cx * gt4 + cy * gt5
          out += InternalRow(px, py, gx, gy, v)
        }
        px += 1
      }
      py += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): RasterXyz =
    copy(children = newChildren)
}
