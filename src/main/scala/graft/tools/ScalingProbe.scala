package graft.tools

import org.apache.spark.sql.functions._
import graft.Bench

/** Micro-probe: which pipeline stage limits thread scaling. Times three
  * workloads at local[8] and local[32]: generation, decode-only, warp-only. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "4000").toLong
    Seq("8", "32").foreach { cpus =>
      val spark = Bench.buildSession(cpus)
      import graft.expr.functions._
      val t0 = System.nanoTime()
      val images = graft.gen.Fixtures.imagesFromRange(spark, n, spark.sparkContext.defaultParallelism)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      images.count()
      val tGen = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      images.select(image_stats(col("bytes"), col("fmt"), col("w"), col("h")).as("s"))
        .write.format("noop").mode("overwrite").save()
      val tDec = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      graft.ops.Tiling.baseTiles(images, 6).write.format("noop").mode("overwrite").save()
      val tWarp = (System.nanoTime() - t2) / 1e9
      val t3 = System.nanoTime()
      val joined = images
        .withColumn("stats", image_stats(col("bytes"), col("fmt"), col("w"), col("h")))
        .withColumn("env", footprint(col("gt"), col("w"), col("h"), col("srid")))
        .filter(col("stats")(0) >= 1)
        .transform(df => graft.ops.SpatialJoin.envJoin(df, Bench.regionsDf(spark), "key", "region_id", level = 5))
        .dropDuplicates("key")
      joined.write.format("noop").mode("overwrite").save()
      val tJoin = (System.nanoTime() - t3) / 1e9
      println(f"PROBE cpus=$cpus gen=$tGen%.2f decode=$tDec%.2f warp=$tWarp%.2f join=$tJoin%.2f")
      spark.stop()
    }
  }
}
