package graft.tools

import org.apache.spark.sql.functions._
import graft.Bench

object WarpProbe2 {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "4000").toLong
    val spark = Bench.buildSession("8")
    import spark.implicits._
    val images = graft.gen.Fixtures.imagesFromRange(spark, n, 8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println("images: " + images.count())
    val t0 = System.nanoTime()
    val assigned = graft.ops.Tiling.assign(images, 6, 6)
      .select(col("tile"), col("bytes"), col("fmt"), graft.ops.Tiling.meta9.as("meta"))
    println("assignments: " + assigned.count() + f" in ${(System.nanoTime()-t0)/1e9}%.1f s")
    val warpMs = spark.sparkContext.longAccumulator("warpMs")
    val warps = spark.sparkContext.longAccumulator("warps")
    val mergeMs = spark.sparkContext.longAccumulator("mergeMs")
    val t1 = System.nanoTime()
    val tiles = assigned.as[(Long, Array[Byte], String, Seq[Double])]
      .groupByKey(_._1)
      .mapGroups { (tile, rows) =>
        var buf: Array[Byte] = null
        var nn = 0L
        val mx = java.lang.management.ManagementFactory.getThreadMXBean
        rows.foreach { case (_, bytes, fmt, meta) =>
          val w0 = System.nanoTime()
          val c0 = mx.getCurrentThreadCpuTime
          val warped = graft.expr.WarpKernels.warpToTile(bytes, fmt, meta.toArray, tile, "near")
          mergeMs.add((mx.getCurrentThreadCpuTime - c0) / 1000000)
          warpMs.add((System.nanoTime() - w0) / 1000000)
          warps.add(1)
          buf = if (buf == null) warped else graft.expr.MosaicAgg.merge(buf, warped)
          nn += 1
        }
        (tile, nn, buf.length)
      }.toDF("tile", "n", "len")
    tiles.write.format("noop").mode("overwrite").save()
    println(f"warp stage wall ${(System.nanoTime()-t1)/1e9}%.1f s; warps=${warps.value} wallMs=${warpMs.value} cpuMs=${mergeMs.value}")
    // plain-loop ground truth in the SAME JVM, post-Spark-stage
    val work = assigned.as[(Long, Array[Byte], String, Seq[Double])].collect()
    println(s"collected ${work.length}")
    val p0 = System.nanoTime()
    work.foreach { case (t, b, f, m) => graft.expr.WarpKernels.warpToTile(b, f, m.toArray, t, "near") }
    println(f"plain single-thread same JVM: ${(System.nanoTime()-p0)/1e9}%.1f s (${(System.nanoTime()-p0)/1e6/work.length}%.2f ms/warp)")
    spark.stop()
  }
}
