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
