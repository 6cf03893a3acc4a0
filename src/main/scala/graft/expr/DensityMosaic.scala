package graft.expr

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Density (alpha) mosaic over planes buffers whose last plane carries a
  * 0..255 per-pixel DENSITY instead of binary validity — the reference's
  * warp density-mask blending (alg/gdalwarpkernel.cpp UnifiedSrcDensity /
  * dfDensity path; masks fed per gdalwarpoperation.cpp).
  *
  * The reference blends sequentially (dst = src·ds + dst·dd·(1−ds)),
  * which depends on draw order — acceptable single-node, fatal for a
  * distributed mosaic where shuffle order is nondeterministic. The rule
  * here is the commutative/associative reformulation: accumulate
  * num_b = Σ d·v and den = Σ d per pixel in integers and finish with
  * v = floor(num/den + 0.5), density = min(255, Σd). Integer accumulation
  * means EVERY merge order and partial-aggregation split yields the
  * bit-identical tile (DensityMosaicSpec asserts this).
  */
object DensityMosaic {
  import PlaneBuf.PlanePx

  /** Flat accumulator: [band0 num.. bandN-1 num, den], each PlanePx longs. */
  def accumulate(acc0: Array[Long], buf: Array[Byte]): Array[Long] = {
    if (buf.isEmpty) return acc0
    val planes = PlaneBuf.nPlanes(buf)
    val bands = planes - 1
    val acc = if (acc0.isEmpty) new Array[Long](planes * PlanePx) else acc0
    require(acc.length == planes * PlanePx, s"accumulator/buffer plane mismatch")
    val dOff = bands * PlanePx
    var i = 0
    while (i < PlanePx) {
      val d = buf(dOff + i) & 0xFF
      if (d != 0) {
        var b = 0
        while (b < bands) {
          acc(b * PlanePx + i) += d.toLong * (buf(b * PlanePx + i) & 0xFF)
          b += 1
        }
        acc(dOff + i) += d
      }
      i += 1
    }
    acc
  }

  def combine(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length, s"accumulator mismatch ${a.length} vs ${b.length}")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  /** Finish: blended planes buffer (v = round-half-up of the density-
    * weighted mean, exact in integers; density = saturating Σd). */
  def finishAcc(acc: Array[Long]): Array[Byte] = {
    if (acc.isEmpty) return Array.emptyByteArray
    val planes = acc.length / PlanePx
    val bands = planes - 1
    val dOff = bands * PlanePx
    val out = new Array[Byte](planes * PlanePx)
    var i = 0
    while (i < PlanePx) {
      val den = acc(dOff + i)
      if (den > 0) {
        var b = 0
        while (b < bands) {
          val v = ((2L * acc(b * PlanePx + i) + den) / (2L * den)).toInt
          out(b * PlanePx + i) = (if (v > 255) 255 else v).toByte
          b += 1
        }
        out(dOff + i) = (if (den > 255) 255 else den.toInt).toByte
      }
      i += 1
    }
    out
  }

  /** One-shot blend over an iterator of planes buffers (mapGroups path —
    * the streaming per-group merge Tiling uses to dodge hash-agg buffer
    * blowup; see ops/Tiling.scala). */
  def blend(bufs: Iterator[Array[Byte]]): Array[Byte] = {
    var acc = Array.emptyLongArray
    while (bufs.hasNext) acc = accumulate(acc, bufs.next())
    finishAcc(acc)
  }
}

/** The typed Aggregator surface of DensityMosaic (partial-agg safe: the
  * long accumulator rides the shuffle; order cannot change the result). */
object MosaicDensityAgg extends Aggregator[Array[Byte], Array[Long], Array[Byte]] {
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(acc: Array[Long], input: Array[Byte]): Array[Long] =
    DensityMosaic.accumulate(acc, input)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    DensityMosaic.combine(a, b)
  override def finish(acc: Array[Long]): Array[Byte] = DensityMosaic.finishAcc(acc)
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
}
