package graft.tools
import graft.Bench
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val qs = graft.SparkEntry.queries
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    graft.gen.Fixtures.imagesFromParts(spark, sfDir)
    args.foreach { name =>
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime()
        qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        graft.pipeline.Caches.release()
        println(f"TIMING $name run$run ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
