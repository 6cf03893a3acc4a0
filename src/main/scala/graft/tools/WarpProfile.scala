package graft.tools

import graft.core._
import graft.gen.Fixtures

/** Micro-profiler for the warp kernel across fixture image classes. */
object WarpProfile {
  def time[A](label: String, reps: Int)(f: => A): Unit = {
    f // warm
    val t0 = System.nanoTime()
    var i = 0
    while (i < reps) { f; i += 1 }
    println(f"$label: ${(System.nanoTime() - t0) / 1e6 / reps}%.2f ms/op")
  }

  def meta(r: Fixtures.ImageRow): Array[Double] =
    Array(r.w.toDouble, r.h.toDouble, r.srid.toDouble) ++ r.gt

  def tileOf(r: Fixtures.ImageRow): Long = {
    val env = graft.expr.GeoKernels.footprint(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(r.gt), r.w, r.h, r.srid).toDoubleArray()
    val mx = Mercator.x((env(0) + env(2)) / 2)
    val my = Mercator.y(Mercator.clampLat((env(1) + env(3)) / 2))
    TileMath.pack(6, TileMath.tileX(mx, 6), TileMath.tileY(my, 6))
  }

  def main(args: Array[String]): Unit = {
    val keys = Seq(
      0L -> "raw16_4326", 3L -> "raw256_4326_span.04", 11L -> "jpeg256_4326",
      1L -> "png20_utm", 201L -> "png20_utm2", 105L -> "utm_raw?",
      15L -> "raw256_span.16", 995L -> "jpeg256_span4.98", 491L -> "span4.9_small")
    keys.foreach { case (k, label) =>
      val img = Fixtures.genImage(k)
      val t = tileOf(img)
      time(f"warp k=$k%-4d $label srid=${img.srid} w=${img.w} fmt=${img.fmt}", 10)(
        graft.expr.WarpKernels.warpToTile(img.bytes, img.fmt, meta(img), t, "near"))
    }
  }
}
