package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import graft.core._

/** Linear / power-law contrast stretch — the gdal_translate `-scale
  * [-exponent]` band-rescale (apps/gdal_translate_lib.cpp, the
  * sScaleParams path): src range [a, b] maps to dst range [c, d] with
  *   linear:   out = c + round( (v−a)·(d−c) / (b−a) )
  *   exponent: out = c + round( ((v−a)/(b−a))^e · (d−c) )
  * where v is first clamped to the src range (the reference clips
  * before scaling, gdal_translate_lib.cpp GDALTranslateScaleParams).
  *
  * Restricted here to integer endpoints and integer exponents so every
  * output value is derivable in exact int64 arithmetic: with x = v−a
  * clamped to [0, r], r = b−a, the rounded result is
  *   (x^e·(d−c)·2 + r^e) div (2·r^e)
  * (round-half-up on a non-negative rational — x^e ≤ 255^e and e ≤ 3
  * keep everything well inside int64). The whole stretched plane is
  * value-checked by its GDAL checksum plus the exact sum and the
  * clipped-pixel counts, all SQL-mirrorable. One decode per image;
  * map-only per-row kernel.
  */
case class RasterScale(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 9,
    "raster_scale(bytes, fmt, w, h, srcMin, srcMax, dstMin, dstMax, exponent)")
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, StringType, IntegerType, IntegerType,
      IntegerType, IntegerType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = StructType(Seq(
    StructField("cks_scaled", IntegerType, nullable = false),
    StructField("sum_scaled", LongType, nullable = false),
    StructField("n_clip_lo", LongType, nullable = false),
    StructField("n_clip_hi", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "raster_scale"

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val w = vals(2).asInstanceOf[Int]; val h = vals(3).asInstanceOf[Int]
    val a = vals(4).asInstanceOf[Int]; val b = vals(5).asInstanceOf[Int]
    val c = vals(6).asInstanceOf[Int]; val d = vals(7).asInstanceOf[Int]
    val e = vals(8).asInstanceOf[Int]
    if (b <= a || d < c || e < 1 || e > 3) return null
    val band = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h).bands(0)
    val r = (b - a).toLong
    val re = { var p = 1L; var i = 0; while (i < e) { p *= r; i += 1 }; p }
    val dc = (d - c).toLong
    val out = new Array[Int](band.length)
    var sum = 0L
    var nLo = 0L; var nHi = 0L
    var i = 0
    while (i < band.length) {
      val v = band(i)
      if (v < a) nLo += 1
      if (v > b) nHi += 1
      val x = math.min(math.max(v - a, 0), r).toLong
      val xe = { var p = 1L; var k = 0; while (k < e) { p *= x; k += 1 }; p }
      val o = (c + (xe * dc * 2 + re) / (2 * re)).toInt
      out(i) = o
      sum += o
      i += 1
    }
    InternalRow(GdalChecksum.ofInts(out, w, h), sum, nLo, nHi)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): RasterScale =
    copy(children = newChildren)
}
