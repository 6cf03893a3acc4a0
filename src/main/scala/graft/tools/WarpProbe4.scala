package graft.tools

import org.apache.spark.sql.functions._
import graft.Bench

object WarpProbe4 {
  def arith(): Long = { // pure-register loop: slow only if interpreted/throttled
    var x = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < 20000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    x
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "4000").toLong
    val spark = Bench.buildSession("8")
    import spark.implicits._
    val images = graft.gen.Fixtures.imagesFromRange(spark, n, 8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    images.count()
    // driver-side baselines
    val cal = graft.gen.Fixtures.genImage(42L)
    val calMeta = Array(cal.w.toDouble, cal.h.toDouble, cal.srid.toDouble) ++ cal.gt
    val calTile = graft.core.TileMath.pack(6, 10, 20)
    def timeMs[A](f: => A): Double = { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e6 }
    println(f"driver arith: ${timeMs(arith())}%.1f ms, driver calwarp: ${timeMs(graft.expr.WarpKernels.warpToTile(cal.bytes, cal.fmt, calMeta, calTile, "near"))}%.2f ms")
    val assigned = graft.ops.Tiling.assign(images, 6, 6)
      .select(col("tile"), col("bytes"), col("fmt"), graft.ops.Tiling.meta9.as("meta"))
    val t1 = System.nanoTime()
    val res = assigned.as[(Long, Array[Byte], String, Seq[Double])]
      .groupByKey(_._1)
      .mapGroups { (tile, rows) =>
        var msgs = List.empty[String]
        var i = 0
        rows.foreach { case (_, bytes, fmt, meta) =>
          if (i % 300 == 0) {
            val aMs = timeMs(arith())
            val cMs = timeMs(graft.expr.WarpKernels.warpToTile(cal.bytes, cal.fmt, calMeta, calTile, "near"))
            msgs ::= f"arith=$aMs%.0fms cal=$cMs%.1fms"
          }
          graft.expr.WarpKernels.warpToTile(bytes, fmt, meta.toArray, tile, "near")
          i += 1
        }
        (tile, msgs.mkString(";"))
      }.toDF("tile", "msgs")
    val msgs = res.filter(length(col("msgs")) > 0).select("msgs").as[String].collect()
    println(f"stage wall ${(System.nanoTime()-t1)/1e9}%.1f s")
    println("samples: " + msgs.take(20).mkString(" | "))
    spark.stop()
  }
}
