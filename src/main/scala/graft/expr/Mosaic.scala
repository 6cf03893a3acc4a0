package graft.expr

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Per-tile mosaic accumulator over planes buffers (SURVEY.md §2.10: the
  * reference's hand-rolled swq_summary accumulators → a typed Aggregator).
  *
  * Blend rule: per-pixel, valid beats invalid; among valid contributions
  * the maximum band value wins. Unlike the reference GTI mosaic's
  * index-order "first wins" (frmts/gti/gdaltileindexdataset.cpp), this rule
  * is commutative + associative, so partial aggregation and shuffle order
  * can't change the result — a requirement the single-threaded reference
  * never had. Deviation documented; goldens are computed under this rule.
  */
object MosaicAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  override def zero: Array[Byte] = Array.emptyByteArray

  override def reduce(buf: Array[Byte], input: Array[Byte]): Array[Byte] = merge(buf, input)

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a.isEmpty) return if (b.isEmpty) a else b.clone()
    if (b.isEmpty) return a
    require(a.length == b.length, s"plane buffer mismatch ${a.length} vs ${b.length}")
    val planePx = PlaneBuf.PlanePx
    val bands = a.length / planePx - 1
    val vOff = bands * planePx
    var i = 0
    while (i < planePx) {
      val av = a(vOff + i) != 0
      val bv = b(vOff + i) != 0
      if (bv && !av) {
        var bb = 0
        while (bb < bands) { a(bb * planePx + i) = b(bb * planePx + i); bb += 1 }
        a(vOff + i) = 1
      } else if (av && bv) {
        var bb = 0
        while (bb < bands) {
          val off = bb * planePx + i
          if ((b(off) & 0xFF) > (a(off) & 0xFF)) a(off) = b(off)
          bb += 1
        }
      }
      i += 1
    }
    a
  }

  override def finish(reduction: Array[Byte]): Array[Byte] = reduction
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
