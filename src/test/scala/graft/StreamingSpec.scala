package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.Streams

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The file-stream source wants a directory; testdata ships one file. */
  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.Sf}/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("streaming hourly window agg equals the batch result") {
    val dir = eventsDir
    val stream = Streams.readEventStream(spark, dir)
    val q = Streams.hourlyCounts(stream).writeStream
      .outputMode("complete").format("memory").queryName("hourly_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .as[(Long, String, Long, Long)].collect().toSet
      val batch = Streams.hourlyCounts(spark.read.parquet(dir))
        .as[(Long, String, Long, Long)].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("stateful sessionize final state equals the batch window computation") {
    val dir = eventsDir
    val stream = spark.readStream.schema(Streams.EventSchema)
      .parquet(dir) // single trigger: all files at once → final state per user
    val q = Streams.sessionize(spark, stream).writeStream
      .outputMode("update").format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      // last update per user is the final state
      val streamed = spark.table("sess_out")
        .groupBy(col("user_id"))
        .agg(max(col("n_sessions")).as("n_sessions"), max(col("n_events")).as("n_events"))
        .as[(Long, Int, Long)].collect().toSet
      val batch = SparkEntry.queries("q17_sessionize")(spark, TestSpark.Sf)
        .as[(Long, Long, Long)].collect().map(r => (r._1, r._2.toInt, r._3)).toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
