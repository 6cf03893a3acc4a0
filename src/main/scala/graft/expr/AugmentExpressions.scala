package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import graft.core._

/** Deterministic training-time augmentation (§2.11): the flip/rotate
  * family every image loader applies, verified by the GDAL checksum of
  * each augmented view so the transform itself is value-checked without
  * shipping the augmented pixels. Index conventions (w = h = s here; the
  * fixture corpus is square):
  *
  *   flip_h : out(x, y) = in(s−1−x, y)
  *   flip_v : out(x, y) = in(x, s−1−y)
  *   rot180 : out(x, y) = in(s−1−x, s−1−y)
  *   rot90  : out(x, y) = in(y, s−1−x)   (source pixel (sx, sy) lands at
  *            output (s−1−sy, sx) — one quarter turn)
  *
  * One decode per image; the four views reuse the decoded band through
  * index remaps (no re-encode). CodegenFallback like every raster kernel
  * here. The reference analog is gdal_translate's axis flips via negative
  * geotransform pixel sizes; the augmentation FRAME (per-row kernel over
  * the corpus, checksum oracle) is engine-native.
  */
case class RasterAugment(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 4, "raster_augment(bytes, fmt, w, h)")
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, StringType, IntegerType, IntegerType)
  override def dataType: DataType = StructType(Seq(
    StructField("cks_id", IntegerType, nullable = false),
    StructField("cks_fh", IntegerType, nullable = false),
    StructField("cks_fv", IntegerType, nullable = false),
    StructField("cks_r90", IntegerType, nullable = false),
    StructField("cks_r180", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "raster_augment"

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val w = vals(2).asInstanceOf[Int]; val h = vals(3).asInstanceOf[Int]
    if (w != h) return null // quarter turns need square frames; fixture is square
    val s = w
    val b = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h).bands(0)
    def remap(sx: (Int, Int) => Int, sy: (Int, Int) => Int): Array[Int] = {
      val o = new Array[Int](s * s)
      var y = 0
      while (y < s) {
        var x = 0
        while (x < s) { o(y * s + x) = b(sy(x, y) * s + sx(x, y)); x += 1 }
        y += 1
      }
      o
    }
    InternalRow(
      GdalChecksum.ofInts(b, s, s),
      GdalChecksum.ofInts(remap((x, _) => s - 1 - x, (_, y) => y), s, s),
      GdalChecksum.ofInts(remap((x, _) => x, (_, y) => s - 1 - y), s, s),
      GdalChecksum.ofInts(remap((_, y) => y, (x, _) => s - 1 - x), s, s),
      GdalChecksum.ofInts(remap((x, _) => s - 1 - x, (_, y) => s - 1 - y), s, s))
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): RasterAugment =
    copy(children = newChildren)
}
