package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Times individual SparkEntry queries (args = query names) on
  * SPARK_GRAFT_SF_DIR, printing wall seconds and Spark job count per query
  * — the per-round feedback loop for job-count/perf work. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    args.foreach { n =>
      graft.pipeline.Caches.release()
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val cnt = graft.SparkEntry.queries(n)(spark, sf).count()
      val secs = (System.nanoTime() - t0) / 1e9
      graft.pipeline.Caches.release()
      // listener events are async; give the bus a beat before reading
      Thread.sleep(200)
      println(f"QTIME $n rows=$cnt%d secs=$secs%.3f jobs=${jobs.get() - j0}%d")
    }
    spark.stop()
  }
}
