package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import graft.core._

/** Raster morphology + inspection expressions (§2.8 sieve/proximity/fill,
  * §2.4 histogram, §2.1 windowed read). All CodegenFallback: per-row cost
  * is the kernel. */

/** sieve_stats(bytes, fmt, meta9, shift, threshold, connect8) →
  * struct<n_before:int, n_after:int, checksum:int> — component counts of
  * the (value >> shift) band before/after the sieve, checksum of the
  * sieved band (alg/gdalsievefilter.cpp:178 semantics). */
case class SieveStats(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 6, "sieve_stats(bytes, fmt, meta9, shift, threshold, connect8)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, StringType, ArrayType(DoubleType), IntegerType, IntegerType, BooleanType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_before", IntegerType, nullable = false),
    StructField("n_after", IntegerType, nullable = false),
    StructField("checksum", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "sieve_stats"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val meta = vals(2).asInstanceOf[ArrayData].toDoubleArray()
    val w = meta(0).toInt; val h = meta(1).toInt
    val shift = vals(3).asInstanceOf[Int]
    val threshold = vals(4).asInstanceOf[Int]
    val connect8 = vals(5).asInstanceOf[Boolean]
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    val band = if (shift == 0) r.bands(0) else r.bands(0).map(_ >> shift)
    val (_, sizesBefore) = Morph.label(band, w, h, connect8)
    val sieved = Morph.sieve(band, w, h, threshold, connect8)
    val (_, sizesAfter) = Morph.label(sieved, w, h, connect8)
    org.apache.spark.sql.catalyst.InternalRow(
      sizesBefore.length, sizesAfter.length, GdalChecksum.ofInts(sieved, w, h))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SieveStats =
    copy(children = c)
}

/** proximity_stats(bytes, fmt, meta9, shift, targetClass) →
  * struct<dmax:double, dsum_q:bigint, checksum:int> — exact euclidean
  * distance (pixels) to the nearest pixel of `targetClass`; dsum_q sums
  * round(dist·1000), checksum is of the round(dist) int raster
  * (alg/gdalproximity.cpp:94 purpose; exact EDT here). NULL when the
  * class is absent. */
case class ProximityStats(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 5, "proximity_stats(bytes, fmt, meta9, shift, target_class)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, StringType, ArrayType(DoubleType), IntegerType, IntegerType)
  override def dataType: DataType = StructType(Seq(
    StructField("dmax", DoubleType, nullable = false),
    StructField("dsum_q", LongType, nullable = false),
    StructField("checksum", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "proximity_stats"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val meta = vals(2).asInstanceOf[ArrayData].toDoubleArray()
    val w = meta(0).toInt; val h = meta(1).toInt
    val shift = vals(3).asInstanceOf[Int]
    val target = vals(4).asInstanceOf[Int]
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    val band = if (shift == 0) r.bands(0) else r.bands(0).map(_ >> shift)
    if (!band.exists(_ == target)) return null
    val d2 = Morph.edt2(band, w, h, _ == target)
    var dmax = 0.0
    var dsumQ = 0L
    val ints = new Array[Int](w * h)
    var i = 0
    while (i < d2.length) {
      val d = math.sqrt(d2(i))
      if (d > dmax) dmax = d
      dsumQ += Math.round(d * 1000.0)
      ints(i) = Math.round(d).toInt
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(dmax, dsumQ, GdalChecksum.ofInts(ints, w, h))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ProximityStats =
    copy(children = c)
}

/** fill_nodata_stats(bytes, fmt, meta9, nodata, maxDist) →
  * struct<n_nodata_before:int, n_nodata_after:int, checksum:int>
  * (alg/rasterfill.cpp's ray-search IDW fill, no smoothing passes). */
case class FillNodataStats(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 5, "fill_nodata_stats(bytes, fmt, meta9, nodata, max_dist)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, StringType, ArrayType(DoubleType), IntegerType, IntegerType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_nodata_before", IntegerType, nullable = false),
    StructField("n_nodata_after", IntegerType, nullable = false),
    StructField("checksum", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "fill_nodata_stats"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val meta = vals(2).asInstanceOf[ArrayData].toDoubleArray()
    val w = meta(0).toInt; val h = meta(1).toInt
    val nodata = vals(3).asInstanceOf[Int]
    val maxDist = vals(4).asInstanceOf[Int]
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    val band = r.bands(0)
    val before = band.count(_ == nodata)
    val (filled, after) = Morph.fillNodataWithCount(band, w, h, nodata, maxDist)
    org.apache.spark.sql.catalyst.InternalRow(before, after, GdalChecksum.ofInts(filled, w, h))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FillNodataStats =
    copy(children = c)
}

/** raster_histogram(bytes, fmt, w, h, nBuckets, vmin, vmax) → array<long>
  * bucket counts over [vmin, vmax), GDALRasterBand::GetHistogram-style
  * equal-width buckets; out-of-range pixels are excluded. */
case class RasterHistogram(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 7, "raster_histogram(bytes, fmt, w, h, nBuckets, vmin, vmax)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, StringType, IntegerType, IntegerType, IntegerType, DoubleType, DoubleType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "raster_histogram"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val w = vals(2).asInstanceOf[Int]; val h = vals(3).asInstanceOf[Int]
    val n = vals(4).asInstanceOf[Int]
    val vmin = vals(5).asInstanceOf[Double]; val vmax = vals(6).asInstanceOf[Double]
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    val counts = new Array[Long](n)
    val scale = n / (vmax - vmin)
    val b0 = r.bands(0)
    var i = 0
    while (i < b0.length) {
      val idx = math.floor((b0(i) - vmin) * scale).toInt
      if (idx >= 0 && idx < n) counts(idx) += 1
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): RasterHistogram =
    copy(children = c)
}

/** slice_raster(bytes, fmt, meta9, x0, y0, winW, winH) → binary raw bytes
  * of the band-0 window (the GDALRasterBand::IRasterIO windowed-read
  * surface, gcore/rasterio.cpp:232; dtype already byte-widened by decode).
  * NULL when the window exits the raster. */
case class SliceRaster(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 7, "slice_raster(bytes, fmt, meta9, x0, y0, winW, winH)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, StringType, ArrayType(DoubleType), IntegerType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "slice_raster"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val meta = vals(2).asInstanceOf[ArrayData].toDoubleArray()
    val w = meta(0).toInt; val h = meta(1).toInt
    val x0 = vals(3).asInstanceOf[Int]; val y0 = vals(4).asInstanceOf[Int]
    val ww = vals(5).asInstanceOf[Int]; val wh = vals(6).asInstanceOf[Int]
    if (x0 < 0 || y0 < 0 || x0 + ww > w || y0 + wh > h || ww <= 0 || wh <= 0) return null
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    val b0 = r.bands(0)
    val out = new Array[Byte](ww * wh)
    var y = 0
    while (y < wh) {
      var x = 0
      while (x < ww) {
        out(y * ww + x) = b0((y0 + y) * w + (x0 + x)).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SliceRaster =
    copy(children = c)
}

/** nearblack_stats(bytes, fmt, meta9, near_dist, max_non_black, white) →
  * struct<collar_px:int, checksum:int> — collar-trim mask size and GDAL
  * checksum of band 0 after replacement (apps/nearblack_lib.cpp two-pass
  * scanline semantics; core.NearBlack). */
case class NearBlackStats(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 6, "nearblack_stats(bytes, fmt, meta9, near_dist, max_non_black, white)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, StringType, ArrayType(DoubleType), IntegerType, IntegerType, BooleanType)
  override def dataType: DataType = StructType(Seq(
    StructField("collar_px", IntegerType, nullable = false),
    StructField("checksum", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearblack_stats"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val meta = vals(2).asInstanceOf[ArrayData].toDoubleArray()
    val w = meta(0).toInt; val h = meta(1).toInt
    val nearDist = vals(3).asInstanceOf[Int]
    val maxNonBlack = vals(4).asInstanceOf[Int]
    val white = vals(5).asInstanceOf[Boolean]
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    val bands = r.bands.map(_.clone())
    val mask = NearBlack.run(bands, w, h, nearDist, maxNonBlack, white)
    var collar = 0
    var i = 0
    while (i < mask.length) { if (mask(i)) collar += 1; i += 1 }
    org.apache.spark.sql.catalyst.InternalRow(
      collar, GdalChecksum.ofInts(bands(0), w, h))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): NearBlackStats =
    copy(children = c)
}

/** equalize_stats(bytes, fmt, meta9) → struct<checksum_eq:int, lut64:int,
  * lut128:int, lut192:int> — histogram-equalize band 0 with the
  * gdalenhance LUT (apps/gdalenhance.cpp; core.Enhance) and checksum the
  * result, plus three LUT probe points for the oracle. */
case class EqualizeStats(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 3, "equalize_stats(bytes, fmt, meta9)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, StringType, ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("checksum_eq", IntegerType, nullable = false),
    StructField("lut64", IntegerType, nullable = false),
    StructField("lut128", IntegerType, nullable = false),
    StructField("lut192", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "equalize_stats"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val meta = vals(2).asInstanceOf[ArrayData].toDoubleArray()
    val w = meta(0).toInt; val h = meta(1).toInt
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    val lut = Enhance.equalizationLut(r.bands(0))
    val eq = r.bands(0).map(v => lut(math.max(0, math.min(255, v))))
    org.apache.spark.sql.catalyst.InternalRow(
      GdalChecksum.ofInts(eq, w, h), lut(64), lut(128), lut(192))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): EqualizeStats =
    copy(children = c)
}

/** band_hist(bytes, fmt, meta9) → array<long>(256): raw 256-bin histogram
  * of band 0 — the corpus side of histogram matching (vec_sum over these
  * arrays is the reference histogram; one two-phase aggregate, 256 longs
  * per task on the shuffle). */
case class BandHist(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 3, "band_hist(bytes, fmt, meta9)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, StringType, ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "band_hist"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val meta = vals(2).asInstanceOf[ArrayData].toDoubleArray()
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString,
      meta(0).toInt, meta(1).toInt)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Enhance.bandHistogram(r.bands(0)))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BandHist =
    copy(children = c)
}

/** hist_match_stats(bytes, fmt, meta9) with a driver-summed corpus
  * histogram riding the expression → struct<checksum_hm:int, lut64:int,
  * lut128:int, lut192:int> — remap band 0 through the exact
  * cross-multiplied CDF-inversion LUT (Enhance.matchLut) against the
  * corpus reference and checksum the result, plus three LUT probes. */
case class HistMatchStats(children: Seq[Expression], corpus: Array[Long])
    extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 3, "hist_match_stats(bytes, fmt, meta9)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, StringType, ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("checksum_hm", IntegerType, nullable = false),
    StructField("lut64", IntegerType, nullable = false),
    StructField("lut128", IntegerType, nullable = false),
    StructField("lut192", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "hist_match_stats"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val meta = vals(2).asInstanceOf[ArrayData].toDoubleArray()
    val w = meta(0).toInt; val h = meta(1).toInt
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    val lut = Enhance.matchLut(Enhance.bandHistogram(r.bands(0)), corpus)
    val out = r.bands(0).map(v => lut(v & 0xff))
    org.apache.spark.sql.catalyst.InternalRow(
      GdalChecksum.ofInts(out, w, h), lut(64), lut(128), lut(192))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HistMatchStats =
    copy(children = c)
}

/** los_visible(bytes, fmt, w, h, xa, ya, za, xb, yb, zb) →
  * struct<visible:int, ix:int, iy:int> — point-to-point line of sight
  * over a 1-band terrain raster (alg/los.cpp GDALIsLineOfSightVisible):
  * endpoint pre-checks, then a Bresenham walk with Euclidean-ratio z
  * interpolation; ix/iy = first terrain intersection or (−1, −1). */
case class LosVisible(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 10, "los_visible(bytes, fmt, w, h, xa, ya, za, xb, yb, zb)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, StringType, IntegerType, IntegerType, IntegerType, IntegerType,
      DoubleType, IntegerType, IntegerType, DoubleType)
  override def dataType: DataType = StructType(Seq(
    StructField("visible", IntegerType, nullable = false),
    StructField("ix", IntegerType, nullable = false),
    StructField("iy", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "los_visible"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val w = vals(2).asInstanceOf[Int]; val h = vals(3).asInstanceOf[Int]
    val xa = vals(4).asInstanceOf[Int]; val ya = vals(5).asInstanceOf[Int]
    val xb = vals(7).asInstanceOf[Int]; val yb = vals(8).asInstanceOf[Int]
    // endpoints come from data — out-of-raster rows yield NULL
    if (xa < 0 || xa >= w || ya < 0 || ya >= h ||
        xb < 0 || xb >= w || yb < 0 || yb >= h) return null
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    val (vis, ix, iy) = Los.isVisible(r.bands(0), w, h,
      xa, ya, vals(6).asInstanceOf[Double], xb, yb, vals(9).asInstanceOf[Double])
    org.apache.spark.sql.catalyst.InternalRow(if (vis) 1 else 0, ix, iy)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): LosVisible =
    copy(children = c)
}

/** viewshed_vis(bytes, fmt, w, h, ox, oy, obsH, tgtH) → array<int>
  * visibility map (255/0, row-major) of the 1-band DEM from observer
  * cell (ox, oy) — Wang propagation, Normal/Edge defaults
  * (alg/viewshed/viewshed_executor.cpp; core.Viewshed). */
case class ViewshedVis(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 8, "viewshed_vis(bytes, fmt, w, h, ox, oy, obsH, tgtH)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, StringType, IntegerType, IntegerType, IntegerType, IntegerType, DoubleType, DoubleType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "viewshed_vis"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val w = vals(2).asInstanceOf[Int]; val h = vals(3).asInstanceOf[Int]
    val ox = vals(4).asInstanceOf[Int]; val oy = vals(5).asInstanceOf[Int]
    // observer coordinates come from data — out-of-raster rows yield NULL
    // rather than aborting the job
    if (ox < 0 || ox >= w || oy < 0 || oy >= h) return null
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    val vis = Viewshed.viewshed(r.bands(0), w, h, ox, oy,
      vals(6).asInstanceOf[Double], vals(7).asInstanceOf[Double])
    new GenericArrayData(vis)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ViewshedVis =
    copy(children = c)
}
