package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
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
