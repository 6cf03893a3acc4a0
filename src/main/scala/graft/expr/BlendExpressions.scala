package graft.expr

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import graft.core.{Blend, GdalChecksum, ImageCodec}

/** blend_self(bytes, fmt, meta9, modes, opacity_pct) → array<struct<op,
  * n, checksum, sum>> — the `gdal raster blend` composition surface
  * (apps/gdalalg_raster_blend.cpp) driven per row against deterministic
  * self-derived overlays, so the whole operator stays map-side (one
  * decode, no second scan or join for the overlay):
  *
  *  - base gray plane  = band 0 (v)
  *  - overlay gray     = horizontal flip of v
  *  - RGBA base        = (v, hflip, vflip, rot180); RGBA overlay the
  *    reverse tuple (rot180, vflip, hflip, v)
  *  - hsv value plane  = rot180
  *
  * Modes: the nine byte-exact composition operators (src-over multiply
  * screen overlay hard-light darken lighten color-dodge color-burn) each
  * emit one row; "src-over-rgba" (the reference's SIMD fast path,
  * gTabInvDstA rounding) emits _r/_g/_b/_a rows; "hsv-value" emits
  * _r/_g/_b rows (float32 kernel — ScalaTest-pinned, not SQL-oracled).
  * Checksums are GDAL checksums of the blended planes; sums exact int64.
  */
case class BlendSelf(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 5, "blend_self(bytes, fmt, meta9, modes, opacity_pct)")
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, StringType, ArrayType(DoubleType), ArrayType(StringType), IntegerType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("checksum", IntegerType, nullable = false),
    StructField("sum", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "blend_self"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val meta = vals(2).asInstanceOf[ArrayData].toDoubleArray()
    val w = meta(0).toInt; val h = meta(1).toInt
    val modes = vals(3).asInstanceOf[ArrayData]
    val pct = vals(4).asInstanceOf[Int]
    val op255 = Blend.opacityScale(pct)
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    val v = r.bands(0)
    val n = w * h
    def derive(fx: Boolean, fy: Boolean): Array[Int] = {
      val out = new Array[Int](n)
      var y = 0
      while (y < h) {
        val sy = if (fy) h - 1 - y else y
        var x = 0
        while (x < w) {
          out(y * w + x) = v(sy * w + (if (fx) w - 1 - x else x))
          x += 1
        }
        y += 1
      }
      out
    }
    lazy val hf = derive(fx = true, fy = false)
    lazy val vf = derive(fx = false, fy = true)
    lazy val rot = derive(fx = true, fy = true)

    def row(op: String, plane: Array[Int]): Any = {
      var s = 0L; var i = 0
      while (i < plane.length) { s += plane(i); i += 1 }
      org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(op),
        n.toLong, GdalChecksum.ofInts(plane, w, h), s)
    }

    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var k = 0
    while (k < modes.numElements()) {
      modes.getUTF8String(k).toString match {
        case "src-over-rgba" =>
          val (br, bg, bb, ba) =
            Blend.srcOverRgba(v, hf, vf, rot, rot, vf, hf, v, op255)
          out += row("src-over-rgba_r", br)
          out += row("src-over-rgba_g", bg)
          out += row("src-over-rgba_b", bb)
          out += row("src-over-rgba_a", ba)
        case "hsv-value" =>
          require(pct == 100,
            "hsv-value runs at full opacity only (the reference's dedicated branch)")
          val (br, bg, bb) = Blend.hsvValue(v, hf, vf, rot)
          out += row("hsv-value_r", br)
          out += row("hsv-value_g", bg)
          out += row("hsv-value_b", bb)
        case mode =>
          out += row(mode, Blend.blendGray(v, hf, mode, op255))
      }
      k += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BlendSelf =
    copy(children = c)
}
