package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import graft.core._

/** pixel_calc(bytes, fmt, w, h, expr) → struct<mean:double, checksum:int>
  * of the evaluated per-pixel expression plane (the muParser pixel-function
  * analog; see core.PixelCalc for the dialect; checksum uses the
  * reference's float→int conversion). */
case class PixelCalcExpr(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 5, "pixel_calc(bytes, fmt, w, h, expr)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, StringType, IntegerType, IntegerType, StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("mean", DoubleType, nullable = false),
    StructField("checksum", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "pixel_calc"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val w = vals(2).asInstanceOf[Int]; val h = vals(3).asInstanceOf[Int]
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    val plane = PixelCalc.evalRaster(r, vals(4).toString)
    var s = 0.0
    var i = 0
    while (i < plane.length) { s += plane(i); i += 1 }
    org.apache.spark.sql.catalyst.InternalRow(
      s / plane.length, GdalChecksum.ofDoubles(plane, w, h))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): PixelCalcExpr =
    copy(children = c)
}

/** reclassify(bytes, fmt, w, h, lo, hi, values, default) →
  * struct<checksum:int, sum_v:bigint> of the range-table-reclassified
  * band (gdalalg_raster_reclassify / vrtreclassifier.h semantics: first
  * matching closed range wins; default = pass-through when INT_MIN). */
case class ReclassifyExpr(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 8, "reclassify(bytes, fmt, w, h, lo, hi, values, default)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, StringType, IntegerType, IntegerType,
      ArrayType(DoubleType), ArrayType(DoubleType), ArrayType(IntegerType), IntegerType)
  override def dataType: DataType = StructType(Seq(
    StructField("checksum", IntegerType, nullable = false),
    StructField("sum_v", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "reclassify"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val w = vals(2).asInstanceOf[Int]; val h = vals(3).asInstanceOf[Int]
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    val out = PixelCalc.reclassify(r.bands(0),
      vals(4).asInstanceOf[ArrayData].toDoubleArray(),
      vals(5).asInstanceOf[ArrayData].toDoubleArray(),
      vals(6).asInstanceOf[ArrayData].toIntArray(),
      vals(7).asInstanceOf[Int])
    var s = 0L
    var i = 0
    while (i < out.length) { s += out(i); i += 1 }
    org.apache.spark.sql.catalyst.InternalRow(GdalChecksum.ofInts(out, w, h), s)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ReclassifyExpr =
    copy(children = c)
}

/** pansharpen_profile(bytes, fmt, w, h) → struct<checksums:array<int>,
  * mean:double> — weighted-Brovey self-fusion exercise: pan = per-pixel
  * rounded band mean at full res, ms = the 2×-downsampled bands, fused
  * back to full res (alg/gdalpansharpen.cpp:588 kernel). 3-band only
  * (NULL otherwise). */
case class PansharpenProfile(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 4, "pansharpen_profile(bytes, fmt, w, h)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, StringType, IntegerType, IntegerType)
  override def dataType: DataType = StructType(Seq(
    StructField("checksums", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("mean", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "pansharpen_profile"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val w = vals(2).asInstanceOf[Int]; val h = vals(3).asInstanceOf[Int]
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    if (r.nBands < 3) return null
    val pan = new Array[Int](w * h)
    var i = 0
    while (i < pan.length) {
      pan(i) = math.floor((r.bands(0)(i) + r.bands(1)(i) + r.bands(2)(i)) / 3.0 + 0.5).toInt
      i += 1
    }
    val ms = Warp.downsample2x(r)
    val sharp = Color.pansharpen(pan, w, h, ms, Array(1.0 / 3, 1.0 / 3, 1.0 / 3))
    val cks = sharp.bands.map(b => GdalChecksum.ofInts(b, w, h))
    var s = 0L
    sharp.bands.foreach(b => b.foreach(s += _))
    org.apache.spark.sql.catalyst.InternalRow(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(cks),
      s.toDouble / (3.0 * w * h))
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): PansharpenProfile =
    copy(children = c)
}

/** rgb_to_palette(bytes, fmt, w, h, nColors) → struct<n_colors:int,
  * idx_checksum:int, mean_err:double> — median-cut palette + Floyd–
  * Steinberg dither (alg/gdalmediancut.cpp + gdaldither.cpp behavior);
  * mean_err = mean |rgb − palette[idx]| L2 after dithering. */
case class RgbToPalette(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 5, "rgb_to_palette(bytes, fmt, w, h, nColors)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, StringType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_colors", IntegerType, nullable = false),
    StructField("idx_checksum", IntegerType, nullable = false),
    StructField("mean_err", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "rgb_to_palette"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val w = vals(2).asInstanceOf[Int]; val h = vals(3).asInstanceOf[Int]
    val n = vals(4).asInstanceOf[Int]
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    if (r.nBands < 3) return null
    val palette = Color.medianCutPalette(r, n)
    val idx = Color.ditherFS(r, palette)
    var errSum = 0.0
    var i = 0
    while (i < idx.length) {
      val p = palette(idx(i))
      val dr = r.bands(0)(i) - p._1
      val dg = r.bands(1)(i) - p._2
      val db = r.bands(2)(i) - p._3
      errSum += math.sqrt((dr * dr + dg * dg + db * db).toDouble)
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      palette.length, GdalChecksum.ofInts(idx, w, h), errSum / idx.length)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): RgbToPalette =
    copy(children = c)
}

/** median_cut_split(bytes, fmt, w, h) → struct<axis:int, median_v:int,
  * n_lo:int, lo_sum:bigint, hi_sum:bigint> — the FIRST median-cut split's
  * integer-exact invariants (Color.firstSplit): widest axis, split-channel
  * value at the median position, lo-box size, per-half split-channel sums.
  * The full recursion's palette/dither stay golden-pinned (ColorSpec);
  * these fields give the q81 oracle an exact SQL mirror. */
case class MedianCutSplit(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 4, "median_cut_split(bytes, fmt, w, h)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, StringType, IntegerType, IntegerType)
  override def dataType: DataType = StructType(Seq(
    StructField("axis", IntegerType, nullable = false),
    StructField("median_v", IntegerType, nullable = false),
    StructField("n_lo", IntegerType, nullable = false),
    StructField("lo_sum", LongType, nullable = false),
    StructField("hi_sum", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "median_cut_split"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val w = vals(2).asInstanceOf[Int]; val h = vals(3).asInstanceOf[Int]
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    Color.firstSplit(r) match {
      case Some((axis, medianV, nLo, loSum, hiSum)) =>
        org.apache.spark.sql.catalyst.InternalRow(axis, medianV, nLo, loSum, hiSum)
      case None => null
    }
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MedianCutSplit =
    copy(children = c)
}

/** warp_tile_alpha(bytes, fmt, meta9, tile, kernel, alpha) → planes buffer
  * whose last plane carries per-pixel DENSITY: `alpha` (0..255) where the
  * warp hit the source, 0 elsewhere (the global dfSrcDensity / source
  * alpha of alg/gdalwarpkernel.cpp, feeding DensityMosaic blending). */
case class WarpTileAlpha(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 6, "warp_tile_alpha(bytes, fmt, meta9, tile, kernel, alpha)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, StringType, ArrayType(DoubleType), LongType, StringType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "warp_tile_alpha"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val buf = WarpKernels.warpToTile(
      vals(0).asInstanceOf[Array[Byte]], vals(1).toString,
      vals(2).asInstanceOf[ArrayData].toDoubleArray(),
      vals(3).asInstanceOf[Long], vals(4).toString)
    val alpha = vals(5).asInstanceOf[Int]
    require(alpha >= 0 && alpha <= 255, s"alpha out of range: $alpha")
    val planes = PlaneBuf.nPlanes(buf)
    val dOff = (planes - 1) * PlaneBuf.PlanePx
    var i = 0
    while (i < PlaneBuf.PlanePx) {
      if (buf(dOff + i) != 0) buf(dOff + i) = alpha.toByte
      i += 1
    }
    buf
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): WarpTileAlpha =
    copy(children = c)
}

/** warp_tile_cut(bytes, fmt, meta9, tile, kernel, cutWkb) → planes buffer:
  * warp_tile masked to the cutline polygon (alg/gdalcutline.cpp:224
  * GDALWarpCutlineMasker semantics, binary mask, no blend distance);
  * cutline is lon/lat WKB, rasterized on the tile's 3857 grid. */
case class WarpTileCut(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 6, "warp_tile_cut(bytes, fmt, meta9, tile, kernel, cut_wkb)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, StringType, ArrayType(DoubleType), LongType, StringType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "warp_tile_cut"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val buf = WarpKernels.warpToTile(
      vals(0).asInstanceOf[Array[Byte]], vals(1).toString,
      vals(2).asInstanceOf[ArrayData].toDoubleArray(),
      vals(3).asInstanceOf[Long], vals(4).toString)
    WarpKernels.applyCutline(buf, vals(3).asInstanceOf[Long], vals(5).asInstanceOf[Array[Byte]])
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): WarpTileCut =
    copy(children = c)
}
