package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import graft.core._

/** Training-loader resize (§2.11): the fixed-resolution preprocessing
  * stage every vision training pipeline runs before batching — area
  * (anti-aliased) downsample by an integer factor plus a central
  * half-crop, each value-checked by its GDAL checksum so the geometry
  * remap and the averaging arithmetic are both oracle-verifiable
  * without shipping the resized pixels.
  *
  * Semantics (square frames; the fixture corpus is square):
  *   resized(bx, by) = roundHalfUp( mean of the k×k source block ),
  *                     i.e. (Σblock + k²/2) / k² in exact integers —
  *                     the reference's average overview kernel
  *                     (gcore/overview.cpp GDALDownsampleChunk32R_Average)
  *                     restricted to integral factors, where the two
  *                     agree exactly and the result is SQL-derivable.
  *   crop            = central (s/2)×(s/2) window (origin s/4, s/4).
  *
  * One decode per image; both views reuse the decoded band.
  * CodegenFallback like every raster kernel here.
  */
case class RasterResize(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 5, "raster_resize(bytes, fmt, w, h, factor)")
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, StringType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = StructType(Seq(
    StructField("rw", IntegerType, nullable = false),
    StructField("cks_resized", IntegerType, nullable = false),
    StructField("sum_resized", LongType, nullable = false),
    StructField("cks_crop", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "raster_resize"

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val w = vals(2).asInstanceOf[Int]; val h = vals(3).asInstanceOf[Int]
    val k = vals(4).asInstanceOf[Int]
    if (w != h || k <= 0 || w % k != 0 || w % 4 != 0) return null
    val s = w
    val b = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h).bands(0)
    // area downsample by k with round-half-up on the exact block sum
    val rs = s / k
    val kk = k * k
    val rz = new Array[Int](rs * rs)
    var sumRz = 0L
    var by = 0
    while (by < rs) {
      var bx = 0
      while (bx < rs) {
        var acc = 0L
        var dy = 0
        while (dy < k) {
          var dx = 0
          val rowOff = (by * k + dy) * s + bx * k
          while (dx < k) { acc += b(rowOff + dx); dx += 1 }
          dy += 1
        }
        val v = ((acc + kk / 2) / kk).toInt
        rz(by * rs + bx) = v
        sumRz += v
        bx += 1
      }
      by += 1
    }
    // central half-crop
    val cs = s / 2
    val o = s / 4
    val cr = new Array[Int](cs * cs)
    var y = 0
    while (y < cs) {
      var x = 0
      while (x < cs) { cr(y * cs + x) = b((o + y) * s + (o + x)); x += 1 }
      y += 1
    }
    InternalRow(rs, GdalChecksum.ofInts(rz, rs, rs), sumRz, GdalChecksum.ofInts(cr, cs, cs))
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): RasterResize =
    copy(children = newChildren)
}

/** Per-image exact pixel moments in ONE decode (§2.11): n, Σv, Σv²,
  * min, max over band 0 — the per-row leg of the corpus normalization
  * statistics every training pipeline computes (dataset mean/std for
  * input scaling). The corpus-level reduction is a plain two-phase
  * Spark aggregate over these int64 moments (map-side combined ⇒ one
  * row per class on the shuffle), so the whole job is a single scan at
  * any corpus size.
  */
case class RasterMoments(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 4, "raster_moments(bytes, fmt, w, h)")
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, StringType, IntegerType, IntegerType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_px", LongType, nullable = false),
    StructField("v_sum", LongType, nullable = false),
    StructField("v_sum2", LongType, nullable = false),
    StructField("v_min", IntegerType, nullable = false),
    StructField("v_max", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "raster_moments"

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val w = vals(2).asInstanceOf[Int]; val h = vals(3).asInstanceOf[Int]
    val b = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h).bands(0)
    var i = 0
    var s1 = 0L; var s2 = 0L
    var mn = Int.MaxValue; var mx = Int.MinValue
    while (i < b.length) {
      val v = b(i)
      s1 += v; s2 += v.toLong * v
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    InternalRow(b.length.toLong, s1, s2, mn, mx)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): RasterMoments =
    copy(children = newChildren)
}
