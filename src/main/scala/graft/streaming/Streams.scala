package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import java.sql.Timestamp

/** Structured Streaming surface. The reference is batch-only (SURVEY.md
  * §2.9 — its "streaming" is a pull-based iterator chain), so this module
  * is engine-native capability beyond the reference: the same windowed
  * aggregation DataFrame code runs over readStream, plus a stateful
  * sessionizer via flatMapGroupsWithState.
  */
object Streams {
  val EventSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")

  /** Tumbling 1-hour event-time window counts with a 2-hour watermark.
    * Identical transform works on batch and streaming DataFrames. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * lit(1000)).cast("bigint")).as("sum_mills"))
      .select(unix_timestamp(col("w.start")).as("hr_epoch"), col("event_type"),
        col("cnt"), col("sum_mills"))

  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(EventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  final case class Evt(user_id: Long, ts: Timestamp)
  final case class SessionAgg(user_id: Long, n_sessions: Int, n_events: Long)
  final case class SessState(lastTs: Long, sessions: Int, events: Long)

  /** Streaming exact deduplication for an ingest pipeline: content-hash
    * dedup with bounded state — `dropDuplicatesWithinWatermark` keeps a
    * hash's state only until the watermark passes it, so state size is
    * O(arrival rate × watermark horizon), never O(corpus). The batch
    * analog (Dedup.exact) re-derives survivors globally; this is the
    * continuous front-door filter a 100 TB ingest runs BEFORE the batch
    * dedup ever sees the data. Works on batch frames too (falls back to
    * plain dropDuplicates semantics under the same key). */
  def dedupStream(docs: DataFrame, tsCol: String = "ts", textCol: String = "text",
                  watermark: String = "2 hours"): DataFrame = {
    val hashed = docs.withColumn("text_md5", md5(col(textCol)))
    if (docs.isStreaming)
      hashed.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark("text_md5")
    else hashed.dropDuplicates("text_md5")
  }

  /** Streaming cardinality monitor: per event-time window, the HLL
    * register state of a hashed key — the continuous analog of ops.Hll
    * (q166). A 100 TB ingest watches distinct-rate per window (unique
    * users, unique image hashes) without keeping distinct SETS in
    * state: the streaming aggregation's state per window is one m-byte
    * register array merged by elementwise max (commutative/idempotent,
    * so micro-batch boundaries and replays cannot change a register),
    * and the watermark expires closed windows. The identical transform
    * runs on a batch frame — the spec's parity check. Post-process with
    * [[graft.ops.Hll.withEstimate]] for the estimate columns. */
  def distinctMonitor(events: DataFrame, hashCol: String, tsCol: String = "ts",
                      windowDur: String = "1 hour", watermark: String = "2 hours",
                      p: Int = 8): DataFrame = {
    val agg = udaf(new graft.ops.HllAgg(p))
    val src = if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    src.groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(agg(col(hashCol)).as("regs"))
      .select(unix_timestamp(col("w.start")).as("win_epoch"), col("regs"))
  }

  /** Streaming tile ingest — the continuous front door of the tile
    * pyramid (batch shape: ops/Tiling.baseTiles, q31): a stream of image
    * rows is content-hash deduplicated under a watermark, then each
    * micro-batch is warped to its covering z-tiles and UPSERTED into a
    * hive-partitioned parquet tile store via foreachBatch.
    *
    * Exactly-once story: the mosaic blend (MosaicAgg.merge) is
    * commutative, associative AND idempotent (max-blend over valid
    * pixels), so an at-least-once foreachBatch replay after a crash
    * converges to the same pixel content; only the `n_images` monitoring
    * counter is at-least-once. Dedup state lives in the checkpoint, so a
    * restart still suppresses duplicates first seen before the crash.
    * On a real deployment the store would be a transactional table
    * format; plain parquet + dynamic partition overwrite keeps the same
    * shape with rewrite granularity = one `pfx` bucket. */
  def tileIngest(images: DataFrame, z: Int, storeDir: String, checkpointDir: String,
                 tsCol: String = "ts", watermark: String = "2 hours"): StreamingQuery = {
    val deduped = images.withColumn("img_md5", md5(col("bytes")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("img_md5")
    deduped.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) => upsertTiles(batch, z, storeDir) }
      .start()
  }

  /** Parent-tile depth of the store bucketing: the partition key is the
    * tile's ANCESTOR at zoom z − StorePfxDepth, so one bucket holds at
    * most 4^depth spatially-adjacent tiles. This keeps the
    * dynamic-overwrite rewrite unit O(touched parent tiles) at ANY zoom
    * — a deep-zoom batch touching one city rewrites that city's few
    * parent partitions, never a fixed 1/64 hash slice of the whole store
    * (the round-4 `pmod(tile, 64)` key scattered co-located tiles across
    * hash buckets AND made every bucket grow with the store). */
  val StorePfxDepth = 3

  /** Packed ancestor tile id of `tile` at zoom z − min(depth, z) —
    * the store partition key (TileMath.pack layout). */
  def storePfx(tile: org.apache.spark.sql.Column, z: Int,
               depth: Int = StorePfxDepth): org.apache.spark.sql.Column = {
    val d = math.min(depth, z)
    val px = shiftrightunsigned(tile, 29 + d).bitwiseAND(lit(0x1FFFFFFFL >> d))
    val py = shiftrightunsigned(tile.bitwiseAND(lit(0x1FFFFFFFL)), d)
    lit((z - d).toLong << 58) + px * lit(1L << 29) + py
  }

  /** Merge one (batch) frame of images into the tile store at zoom z.
    * Reads ONLY the `pfx` partitions the batch touches (partition-pruned
    * scan), max-blends new tiles into existing ones, and replaces just
    * those partitions (dynamic partition overwrite) — per-batch work is
    * O(touched tiles), never O(store). */
  def upsertTiles(batch: DataFrame, z: Int, storeDir: String): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    if (batch.isEmpty) return
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // hidden entries (_temporary/_SUCCESS) don't count as data: a crash
    // mid-first-write must leave the REPLAY on the fresh-store path, not
    // failing forever on an unreadable parquet dir
    val storeHasData = fs.exists(storePath) && fs.listStatus(storePath).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    val freshRaw = graft.ops.Tiling.baseTiles(batch, z)
      .withColumn("pfx", storePfx(col("tile"), z))
    // when merging into an existing store the rendered batch is consumed
    // twice (touched-bucket probe + merge) — persist so the warp runs once
    val fresh = if (storeHasData)
      freshRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else freshRaw
    val merged = if (storeHasData) {
      val touched = fresh.select("pfx").distinct().as[Long].collect() // touched parents only
      val existing = spark.read.parquet(storeDir).where(col("pfx").isin(touched.map(Long.box): _*))
      existing.unionByName(fresh)
    } else fresh
    val mergedTiles = merged.select(col("pfx"), col("tile"), col("n_images"), col("buf"))
      .as[(Long, Long, Long, Array[Byte])]
      .groupByKey(_._2)
      .mapGroups { (tile, rows) =>
        var buf: Array[Byte] = null
        var n = 0L
        var pfx = 0L
        rows.foreach { case (p, _, cn, cbuf) =>
          pfx = p
          buf = if (buf == null) cbuf else graft.expr.MosaicAgg.merge(buf, cbuf)
          n += cn
        }
        (pfx, tile, n, buf)
      }.toDF("pfx", "tile", "n_images", "buf")
    // truncate lineage off the store path before overwriting it (Spark
    // rejects a write whose plan still reads the destination); an empty
    // store has no self-read to protect, so skip the materialization
    val out = if (storeHasData) mergedTiles.localCheckpoint(true) else mergedTiles
    try
      out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("pfx").parquet(storeDir)
    finally if (storeHasData) fresh.unpersist()
  }

  /** Stateful per-user session counting (gap > 30 min ⇒ new session) via
    * flatMapGroupsWithState — the custom-state streaming extension point.
    * Emits one running summary row per user per trigger. */
  def sessionize(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"), col("ts")).as[Evt]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionAgg](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (uid: Long, rows: Iterator[Evt], state: GroupState[SessState]) =>
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0, 0L))
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val t = e.ts.getTime
            val newSession = st.lastTs == Long.MinValue || t - st.lastTs > 30L * 60 * 1000
            st = SessState(math.max(st.lastTs, t), st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(st)
          Iterator(SessionAgg(uid, st.sessions, st.events))
      }.toDF()
  }
}
