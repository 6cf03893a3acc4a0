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

  test("streaming HLL distinct monitor equals the batch registers per window") {
    val dir = eventsDir
    val prep = (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("h", graft.text.textfunctions.smix64(col("user_id")))
    val q = Streams.distinctMonitor(prep(Streams.readEventStream(spark, dir)), "h")
      .writeStream.outputMode("complete").format("memory").queryName("card_out").start()
    try {
      q.processAllAvailable()
      def toMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Int]]("regs").toSeq).toMap
      val streamed = toMap(spark.table("card_out"))
      val batch = toMap(Streams.distinctMonitor(prep(spark.read.parquet(dir)), "h"))
      assert(streamed == batch, "per-window register state must not depend on micro-batching")
      assert(batch.nonEmpty && batch.values.exists(_.exists(_ > 0)))
      // estimates derive from the same registers (the q166 arithmetic)
      val est = graft.ops.Hll.withEstimate(
        Streams.distinctMonitor(prep(spark.read.parquet(dir)), "h"))
      assert(est.collect().forall(_.getAs[Double]("est") > 0.0))
    } finally q.stop()
  }

  test("watermark drops late data in append mode") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft_late").toString
    def write(name: String, rows: Seq[(Long, String, Long, String, Double, String)]): Unit =
      rows.map { case (id, ts, uid, et, v, p) => (id, Timestamp.valueOf(ts), uid, et, v, p) }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)

    // batch 1: one event at 10:15 and one at 13:00 → watermark advances
    // to 11:00, closing (and emitting) the 10:00 window
    write("b1", Seq(
      (1L, "2024-01-01 10:15:00", 1L, "click", 1.0, ""),
      (2L, "2024-01-01 13:00:00", 1L, "click", 1.0, "")))
    val stream = spark.readStream.schema(Streams.EventSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = Streams.hourlyCounts(stream).writeStream
      .outputMode("append").format("memory").queryName("late_out").start()
    try {
      q.processAllAvailable()
      // batch 2: a LATE event for the closed 10:00 window → must be dropped
      write("b2", Seq(
        (3L, "2024-01-01 10:30:00", 2L, "click", 1.0, ""),
        (4L, "2024-01-01 16:00:00", 2L, "click", 1.0, "")))
      q.processAllAvailable()
      val out = spark.table("late_out")
        .as[(Long, String, Long, Long)].collect()
      val tenOClock = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
      val tenRows = out.filter(_._1 == tenOClock)
      assert(tenRows.length == 1, "closed window emitted exactly once")
      assert(tenRows.head._3 == 1L, "late event did not join the closed window")
    } finally q.stop()
  }

  test("streaming dedup suppresses in-watermark duplicates and expires state") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup").toString
    def write(rows: Seq[(Long, String, String)]): Unit =
      rows.map { case (id, ts, text) => (id, Timestamp.valueOf(ts), text) }
        .toDF("doc_id", "ts", "text")
        .coalesce(1).write.mode("append").parquet(dir)

    // batch 1: A, dup-of-A (20 min later, inside the 2h watermark), B
    write(Seq(
      (1L, "2024-01-01 10:00:00", "document alpha"),
      (2L, "2024-01-01 10:20:00", "document alpha"),
      (3L, "2024-01-01 10:30:00", "document beta")))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, ts TIMESTAMP, text STRING")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = Streams.dedupStream(stream).writeStream
      .outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      // batch 2: unrelated far-future doc advances the watermark past
      // alpha's state (expiry applies at end-of-batch, so the advance
      // must land one batch BEFORE the re-arrival)
      write(Seq((9L, "2024-01-02 11:00:00", "document gamma")))
      q.processAllAvailable()
      // batch 3: re-arrival of A — its state expired with the watermark,
      // so the duplicate passes (bounded-state semantics)
      write(Seq((4L, "2024-01-02 12:00:00", "document alpha")))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
      assert(ids.contains(1L) && ids.contains(3L), "first arrivals pass")
      assert(!ids.contains(2L), "in-watermark duplicate suppressed")
      assert(ids.contains(4L), "state expired past the watermark — re-arrival passes")
    } finally q.stop()
    // batch fallback: plain global dedup under the same key
    val batch = Streams.dedupStream(
      Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00"), "x"),
        (2L, Timestamp.valueOf("2024-01-01 11:00:00"), "x"))
        .toDF("doc_id", "ts", "text"))
    assert(batch.count() == 1)
  }

  test("streaming tile ingest equals the batch tiling, dedups across a checkpoint restart") {
    import java.sql.Timestamp
    import graft.gen.Fixtures
    val root = java.nio.file.Files.createTempDirectory("graft_ingest")
    val (src, store, ckpt) =
      (root.resolve("src").toString, root.resolve("store").toString, root.resolve("ckpt").toString)
    val z = 3
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "key BIGINT, image_id STRING, bytes BINARY, w INT, h INT, fmt STRING, " +
        "caption STRING, phash BIGINT, gt ARRAY<DOUBLE>, srid INT, ts TIMESTAMP")
    def write(ids: Seq[Long]): Unit =
      ids.map(Fixtures.genImage).toDF()
        .withColumn("ts", lit(Timestamp.valueOf("2024-01-01 10:00:00")))
        .coalesce(1).write.mode("append").parquet(src)
    def startIngest() = Streams.tileIngest(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src),
      z, store, ckpt)

    write(0L to 9L)
    val q1 = startIngest()
    try q1.processAllAvailable() finally q1.stop()

    // restart from the checkpoint; second wave re-sends image 3 (same
    // bytes ⇒ same content hash, first seen BEFORE the restart) — the
    // restored dedup state must suppress it
    write((10L to 14L) :+ 3L)
    val q2 = startIngest()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(store)
      .select(col("tile"), col("n_images"), md5(col("buf")).as("h"))
      .as[(Long, Long, String)].collect().toSet
    val want = graft.ops.Tiling.baseTiles(
      (0L to 14L).map(Fixtures.genImage).toDF(), z)
      .select(col("tile"), col("n_images"), md5(col("buf")).as("h"))
      .as[(Long, Long, String)].collect().toSet
    assert(want.nonEmpty)
    assert(got == want, "incremental store == one-shot batch tiling, bit-for-bit")
  }

  test("deep-zoom store bucketing: parent-tile partitions, rewrite unit = touched parents") {
    import graft.gen.Fixtures
    import graft.expr.functions.{tile_x, tile_y, tile_z}
    val z = 10
    val store = java.nio.file.Files.createTempDirectory("graft_deepzoom").toString
    // small-footprint images (≈0.2° span) in two far-apart regions: the
    // second wave must not rewrite the first wave's parent partitions
    def img(key: Long, lon0: Double, lat0: Double) = {
      val base = Fixtures.genImage(key)
      base.copy(gt = Array(lon0, 0.2 / base.w, 0.0, lat0, 0.0, -0.2 / base.w), srid = 4326)
    }
    val wave1 = Seq(img(0L, -10.0, 45.0), img(2L, -9.7, 44.8)).toDF()
    val wave2 = Seq(img(4L, 100.0, -20.0)).toDF()
    Streams.upsertTiles(wave1, z, store)
    def listing(): Map[String, Set[(String, Long)]] = {
      val root = new java.io.File(store)
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("pfx="))
        .map(d => d.getName ->
          d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.length())).toSet).toMap
    }
    val after1 = listing()
    assert(after1.nonEmpty)
    Streams.upsertTiles(wave2, z, store)
    val after2 = listing()
    // wave-2 parents are disjoint from wave 1 (regions ~110° apart), so
    // every wave-1 partition must be byte-identical — untouched by the
    // dynamic overwrite. The rewrite unit is the touched parents only.
    val touched2 = graft.ops.Tiling.baseTiles(wave2, z)
      .select(Streams.storePfx(col("tile"), z)).distinct().as[Long].collect().toSet
    assert(touched2.nonEmpty)
    after1.keys.foreach { d =>
      val pfxVal = d.stripPrefix("pfx=").toLong
      assert(!touched2.contains(pfxVal), "test regions must map to disjoint parents")
      assert(after2(d) == after1(d), s"untouched parent partition $d was rewritten")
    }
    // partition key IS the packed ancestor: every stored tile's parent at
    // z-3 equals its pfx, and no bucket exceeds 4^3 children
    val rows = spark.read.parquet(store)
      .select(col("pfx"), col("tile"), tile_z(col("tile")).as("tz"),
        tile_x(col("tile")).as("tx"), tile_y(col("tile")).as("ty"))
      .as[(Long, Long, Int, Int, Int)].collect()
    rows.foreach { case (pfx, _, tz, tx, ty) =>
      assert(tz == z)
      val want = ((z - 3).toLong << 58) | ((tx >> 3).toLong << 29) | (ty >> 3).toLong
      assert(pfx == want)
    }
    assert(rows.groupBy(_._1).values.map(_.length).max <= 64)
    // and the merged store equals the one-shot batch tiling bit-for-bit
    val got = spark.read.parquet(store)
      .select(col("tile"), col("n_images"), md5(col("buf")).as("h"))
      .as[(Long, Long, String)].collect().toSet
    val want = graft.ops.Tiling.baseTiles(wave1.unionByName(wave2), z)
      .select(col("tile"), col("n_images"), md5(col("buf")).as("h"))
      .as[(Long, Long, String)].collect().toSet
    assert(got == want)
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
