package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import graft.core._

/** raster_chips(bytes, fmt, meta9, chip, stride) →
  * array<struct<cx:int, cy:int, checksum:int, vsum:bigint>> — the
  * training-chip extraction of a vision-pretraining loader: full
  * chip×chip windows at stride offsets (cx·stride, cy·stride), each
  * summarized by its own GDAL checksum (the chip treated as a standalone
  * raster — local pixel indices) and exact integer pixel sum.
  *
  * The reference's analog is gdal_retile's fixed-size window sweep
  * (swig/python/gdal-utils/osgeo_utils/gdal_retile.py); emitting summary
  * stats instead of re-encoded chip payloads keeps the oracle exact and
  * the fixture output bounded, while the decode/window loop is the real
  * production shape (ONE decode per image; the explode fans chips across
  * the shuffle — never one decode per chip, which at stride≪chip would
  * multiply decode cost by the overlap factor).
  */
case class RasterChips(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 5, "raster_chips(bytes, fmt, meta9, chip, stride)")
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, StringType, ArrayType(DoubleType), IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cx", IntegerType, nullable = false),
    StructField("cy", IntegerType, nullable = false),
    StructField("checksum", IntegerType, nullable = false),
    StructField("vsum", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "raster_chips"

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val meta = vals(2).asInstanceOf[ArrayData].toDoubleArray()
    val w = meta(0).toInt; val h = meta(1).toInt
    val chip = vals(3).asInstanceOf[Int]
    val stride = vals(4).asInstanceOf[Int]
    require(chip > 0 && stride > 0, "chip and stride must be positive")
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    val band = r.bands(0)
    val nx = if (w >= chip) (w - chip) / stride + 1 else 0
    val ny = if (h >= chip) (h - chip) / stride + 1 else 0
    val out = new Array[Any](nx * ny)
    val buf = new Array[Int](chip * chip)
    var cy = 0
    while (cy < ny) {
      var cx = 0
      while (cx < nx) {
        val x0 = cx * stride; val y0 = cy * stride
        var vsum = 0L
        var oy = 0
        while (oy < chip) {
          var ox = 0
          val rowBase = (y0 + oy) * w + x0
          while (ox < chip) {
            val v = band(rowBase + ox)
            buf(oy * chip + ox) = v
            vsum += v
            ox += 1
          }
          oy += 1
        }
        out(cy * nx + cx) =
          InternalRow(cx, cy, GdalChecksum.ofInts(buf, chip, chip), vsum)
        cx += 1
      }
      cy += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): RasterChips =
    copy(children = newChildren)
}
