package graft.tools

import graft.gen.Fixtures
import graft.expr.{GeoKernels, WarpKernels}
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** No-Spark ground truth: all warps of the bench corpus in plain loops,
  * single-threaded and with a fixed thread pool. */
object WarpProbe3 {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "4000").toInt
    val imgs = (0 until n).map(i => Fixtures.genImage(i.toLong))
    val work = imgs.flatMap { im =>
      val env = GeoKernels.footprint(new GenericArrayData(im.gt), im.w, im.h, im.srid)
      val tiles = GeoKernels.tileCover(env, 6, 6).toLongArray()
      val meta = Array(im.w.toDouble, im.h.toDouble, im.srid.toDouble) ++ im.gt
      tiles.map(t => (im.bytes, im.fmt, meta, t))
    }
    println(s"warps to do: ${work.length}")
    // warm
    work.take(200).foreach { case (b, f, m, t) => WarpKernels.warpToTile(b, f, m, t, "near") }
    val t0 = System.nanoTime()
    work.foreach { case (b, f, m, t) => WarpKernels.warpToTile(b, f, m, t, "near") }
    val sec1 = (System.nanoTime() - t0) / 1e9
    println(f"single-thread: $sec1%.1f s (${sec1 * 1000 / work.length}%.2f ms/warp)")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val t1 = System.nanoTime()
    val futs = work.map { case (b, f, m, t) =>
      pool.submit(new Runnable { def run(): Unit = WarpKernels.warpToTile(b, f, m, t, "near") })
    }
    futs.foreach(_.get())
    val sec8 = (System.nanoTime() - t1) / 1e9
    println(f"8-thread pool: $sec8%.1f s (speedup ${sec1 / sec8}%.2f x)")
    pool.shutdown()
  }
}
