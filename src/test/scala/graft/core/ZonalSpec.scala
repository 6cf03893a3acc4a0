package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.expr.ZonalKernels
import org.apache.spark.sql.catalyst.InternalRow

/** zone_stats_full kernel vs an independent brute-force fold (reference
  * stat list apps/gdalalg_raster_zonal_stats.cpp:64-72; exactextract-
  * compatible definitions: quantile(0.5) median, population stdev,
  * tie-low majority/minority). */
class ZonalSpec extends AnyFunSuite {

  private def statsOf(w: Int, h: Int, seed: Long, zone: (Double, Double, Double, Double)) = {
    val rnd = new scala.util.Random(seed)
    val band = Array.fill(w * h)(rnd.nextInt(256))
    val r = Raster(w, h, Array(band, band.map(v => (v * 3 + 1) % 256)))
    val bytes = ImageCodec.encode(r, "raw")
    val gt = Array(0.0, 1.0, 0.0, h.toDouble, 0.0, -1.0) // 1 unit per pixel, north-up
    val meta = Array(w.toDouble, h.toDouble, 0.0) ++ gt
    val (zx0, zy0, zx1, zy1) = zone
    val wkb = Wkb.writeBox(zx0, zy0, zx1, zy1)
    val row = ZonalKernels.zoneStatsFull(bytes, "raw", meta, wkb, 1)
    (band, r.bands(1), row)
  }

  test("full zonal record matches brute force on a random raster") {
    val w = 37; val h = 29
    val (band, wband, rowAny) = statsOf(w, h, 99L, (5.3, 4.7, 20.1, 17.9))
    val row = rowAny.asInstanceOf[InternalRow]
    // brute force: pixel center (x+0.5, h-y-0.5) in zone box
    val sel = for {
      y <- 0 until h; x <- 0 until w
      cx = x + 0.5; cy = h - y - 0.5
      if cx > 5.3 && cx < 20.1 && cy > 4.7 && cy < 17.9
    } yield (x, y, band(y * w + x))
    val vals = sel.map(_._3)
    assert(row.getLong(0) == vals.length.toLong)
    assert(row.getInt(1) == vals.min && row.getInt(2) == vals.max)
    assert(row.getLong(3) == vals.map(_.toLong).sum)
    assert(math.abs(row.getDouble(4) - vals.map(_.toDouble).sum / vals.length) < 1e-12)
    // median: quantile(0.5), even n → mean of middles
    val sorted = vals.sorted
    val med = if (sorted.length % 2 == 1) sorted(sorted.length / 2).toDouble
      else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2.0
    assert(row.getDouble(5) == med)
    // majority/minority, tie → lowest value
    val freq = vals.groupBy(identity).view.mapValues(_.size).toMap
    val maj = freq.toSeq.sortBy { case (v, n) => (-n, v) }.head._1
    val mnr = freq.toSeq.sortBy { case (v, n) => (n, v) }.head._1
    assert(row.getInt(6) == maj && row.getInt(7) == mnr)
    assert(row.getInt(8) == freq.size) // variety
    // population variance
    val mean = vals.map(_.toDouble).sum / vals.length
    val popVar = vals.map(v => (v - mean) * (v - mean)).sum / vals.length
    assert(math.abs(row.getDouble(10) - popVar) < 1e-6)
    assert(math.abs(row.getDouble(9) - math.sqrt(popVar)) < 1e-9)
    // centers: mean of pixel-center coordinates
    val mcx = sel.map(p => p._1 + 0.5).sum / sel.length
    val mcy = sel.map(p => h - p._2 - 0.5).sum / sel.length
    assert(math.abs(row.getDouble(11) - mcx) < 1e-9)
    assert(math.abs(row.getDouble(12) - mcy) < 1e-9)
    // min/max centers: first row-major occurrence
    val minPix = sel.find(_._3 == vals.min).get
    val maxPix = sel.find(_._3 == vals.max).get
    assert(row.getDouble(13) == minPix._1 + 0.5 && row.getDouble(14) == h - minPix._2 - 0.5)
    assert(row.getDouble(15) == maxPix._1 + 0.5 && row.getDouble(16) == h - maxPix._2 - 0.5)
    // weighted: band 1 as weights
    val wsum = sel.map(p => p._3.toLong * wband(p._2 * w + p._1)).sum
    val wtot = sel.map(p => wband(p._2 * w + p._1).toLong).sum
    assert(row.getLong(17) == wsum)
    assert(math.abs(row.getDouble(18) - wsum.toDouble / wtot) < 1e-12)
  }

  test("missing weights band yields null weighted stats; empty zone yields null") {
    val r = Raster(4, 4, Array(Array.fill(16)(7)))
    val bytes = ImageCodec.encode(r, "raw")
    val meta = Array(4.0, 4.0, 0.0, 0.0, 1.0, 0.0, 4.0, 0.0, -1.0)
    val row = ZonalKernels.zoneStatsFull(bytes, "raw", meta, Wkb.writeBox(0, 0, 4, 4), 1)
      .asInstanceOf[InternalRow]
    assert(row.isNullAt(17) && row.isNullAt(18))
    assert(row.getDouble(5) == 7.0 && row.getInt(6) == 7 && row.getInt(8) == 1)
    val empty = ZonalKernels.zoneStatsFull(bytes, "raw", meta, Wkb.writeBox(10, 10, 11, 11), 1)
    assert(empty == null)
  }
}
