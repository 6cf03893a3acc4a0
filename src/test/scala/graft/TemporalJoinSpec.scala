package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.window.WindowExec
import graft.ops.TemporalJoin

/** TemporalJoin invariants: the bucketed as-of equals the one-window
  * naive plan for EVERY granule width (including the degenerate
  * one-bucket width, which IS the naive shape); tie rows resolve by the
  * documented (ts, side, ord) order; the hot-key plan never sorts a
  * key's full history in one window; the banded interval join equals the
  * direct theta-join and is width-invariant. */
class TemporalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = 3600000000L // one hour in micros

  /** (key, tsu, ord, payload) fixture frames with a timestamp column. */
  private def frame(rows: Seq[(Long, Long, Long, Double)]): DataFrame =
    rows.toDF("user_id", "tsu", "event_id", "value")
      .select(col("user_id"), timestamp_micros(col("tsu")).as("ts"),
        col("event_id"), col("value"))

  private def randomSides(seed: Int, n: Int, keys: Int): (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      (rnd.nextInt(keys).toLong, rnd.nextLong(72L * H), i.toLong, rnd.nextInt(1000) / 10.0)
    }
    val (b, p) = rows.splitAt(n / 2)
    (frame(p), frame(b))
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("asOf equals the naive one-window plan across granule widths") {
    val (probe, build) = randomSides(seed = 7, n = 600, keys = 9)
    val attach = Seq("event_id" -> "b_id", "value" -> "b_val")
    val want = sortedRows(TemporalJoin.asOfNaive(probe, build, "user_id", "ts", "event_id", attach))
    assert(want.nonEmpty)
    for (w <- Seq(1000000L, H, 24 * H, 100000L * H)) {
      val got = sortedRows(TemporalJoin.asOf(probe, build, "user_id", "ts", "event_id", attach, w))
      assert(got == want, s"bucketMicros=$w diverged from the naive plan")
    }
    graft.pipeline.Caches.release()
  }

  test("asOf tie semantics: inclusive at equal ts, greatest ord wins, null before first build") {
    // key 1: builds at t=10 (ord 0, v=1.0) and t=10 (ord 1, v=2.0), probe at t=10
    //        -> matches ord 1 (equal-ts build matches; greatest ord wins)
    // key 2: build at t=50, probes at t=49 (no match) and t=51 (match)
    val build = frame(Seq((1L, 10L, 0L, 1.0), (1L, 10L, 1L, 2.0), (2L, 50L, 7L, 9.0)))
    val probe = frame(Seq((1L, 10L, 100L, 0.0), (2L, 49L, 101L, 0.0), (2L, 51L, 102L, 0.0)))
    val out = TemporalJoin.asOf(probe, build, "user_id", "ts", "event_id",
        Seq("event_id" -> "b_id", "value" -> "b_val"), bucketMicros = 20L)
      .select(col("event_id"), col("b_id"), col("b_val"))
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out(100L) == ((Some(1L), Some(2.0))))
    assert(out(101L) == ((None, None)))
    assert(out(102L) == ((Some(7L), Some(9.0))))
    graft.pipeline.Caches.release()
  }

  test("asOf hot key: parity + no full-history window in the plan") {
    // one key holds 50% of all rows, spread over 48 granules
    val rnd = new scala.util.Random(11)
    val rows = (0 until 2000).map { i =>
      val k = if (i % 2 == 0) 0L else 1L + rnd.nextInt(20).toLong
      (k, rnd.nextLong(48L * H), i.toLong, rnd.nextInt(1000) / 10.0)
    }
    val (b, p) = rows.splitAt(1000)
    val (probe, build) = (frame(p), frame(b))
    val attach = Seq("value" -> "b_val")
    val out = TemporalJoin.asOf(probe, build, "user_id", "ts", "event_id", attach, H)
    val want = sortedRows(TemporalJoin.asOfNaive(probe, build, "user_id", "ts", "event_id", attach))
    assert(sortedRows(out) == want) // collects: finalizes the AQE plan for the audit below
    // plan audit: every window either includes the granule in its
    // partition spec (per-granule, parallel over the hot key's history)
    // or runs over the granule-level aggregate (the carry window). The
    // pre-AQE physical plan is audited — shape, not runtime stages —
    // and the traversal DESCENDS INTO cached plans: asOf persists the
    // phase-1 frame, so the windowed subplan hides behind an
    // InMemoryTableScanExec leaf that plain collect() won't enter.
    def allWindows(p: org.apache.spark.sql.execution.SparkPlan): Seq[WindowExec] =
      p.collect {
        case w: WindowExec => Seq(w)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allWindows(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allWindows(q.plan)
        case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          allWindows(im.relation.cachedPlan)
      }.flatten
    val wins = allWindows(out.queryExecution.sparkPlan)
    assert(wins.size >= 2, s"expected the phase-1 AND carry windows, got ${wins.size}")
    wins.foreach { w =>
      val byGranule = w.partitionSpec.exists(_.references.exists(_.name == "__tb"))
      val overAgg = w.child.collectFirst {
        case a: HashAggregateExec => a
        case a: ObjectHashAggregateExec => a
        case a: SortAggregateExec => a
      }.isDefined
      assert(byGranule || overAgg,
        s"full-history window survived: partitionSpec=${w.partitionSpec.mkString(",")}")
    }
    graft.pipeline.Caches.release()
  }

  test("asOf null keys: one more group (window semantics), not a silent row drop") {
    def nf(rows: Seq[(Option[Long], Long, Long, Double)]): DataFrame =
      rows.toDF("user_id", "tsu", "event_id", "value")
        .select(col("user_id"), timestamp_micros(col("tsu")).as("ts"),
          col("event_id"), col("value"))
    val build = nf(Seq((Some(1L), 10L, 0L, 5.0), (None, 10L, 1L, 7.0)))
    val probe = nf(Seq((Some(1L), 20L, 100L, 0.0), (None, 20L, 101L, 0.0)))
    val attach = Seq("value" -> "b_val")
    val out = TemporalJoin.asOf(probe, build, "user_id", "ts", "event_id", attach, 15L)
    assert(sortedRows(out) ==
      sortedRows(TemporalJoin.asOfNaive(probe, build, "user_id", "ts", "event_id", attach)))
    val nullRow = out.filter(col("user_id").isNull).select(col("b_val")).collect()
    assert(nullRow.map(_.getDouble(0)).toSeq == Seq(7.0))
    graft.pipeline.Caches.release()
  }

  test("asOf null timestamps: one more granule (nulls-first window semantics), not a drop") {
    def tf(rows: Seq[(Long, Option[Long], Long, Double)]): DataFrame =
      rows.toDF("user_id", "tsu", "event_id", "value")
        .select(col("user_id"), timestamp_micros(col("tsu")).as("ts"),
          col("event_id"), col("value"))
    // key 1: a null-ts build (sorts first), a real build at t=10, a
    // null-ts probe (sees only the null-ts build) and a real probe at
    // t=20 (sees the t=10 build)
    val build = tf(Seq((1L, None, 0L, 3.0), (1L, Some(10L), 1L, 5.0)))
    val probe = tf(Seq((1L, None, 100L, 0.0), (1L, Some(20L), 101L, 0.0)))
    val attach = Seq("value" -> "b_val")
    val out = TemporalJoin.asOf(probe, build, "user_id", "ts", "event_id", attach, 15L)
    assert(sortedRows(out) ==
      sortedRows(TemporalJoin.asOfNaive(probe, build, "user_id", "ts", "event_id", attach)))
    val byId = out.collect().map(r => r.getLong(2) -> Option(r.get(4))).toMap
    assert(byId(100L) == Some(3.0))
    assert(byId(101L) == Some(5.0))
    graft.pipeline.Caches.release()
  }

  test("intervalJoin equals the direct theta-join and is width-invariant") {
    val rnd = new scala.util.Random(23)
    val ivRows = (0 until 300).map { i =>
      val lo = rnd.nextLong(72L * H)
      (rnd.nextInt(7).toLong, i.toLong, lo, lo + 1 + rnd.nextLong(6L * H))
    }
    val intervals = ivRows.toDF("user_id", "iv_id", "lo", "hi")
    val points = frame((0 until 800).map { i =>
      (rnd.nextInt(7).toLong, rnd.nextLong(78L * H), 1000L + i, rnd.nextInt(100) / 10.0)
    })
    val want = sortedRows(intervals.as("i")
      .join(points.withColumnRenamed("user_id", "p_uid").as("p"),
        col("i.user_id") === col("p_uid")
          && unix_micros(col("ts").cast("timestamp")) > col("lo")
          && unix_micros(col("ts").cast("timestamp")) <= col("hi"))
      .select(col("iv_id"), col("event_id")))
    assert(want.nonEmpty)
    for (w <- Seq(H / 7, H, 24 * H)) {
      val got = sortedRows(
        TemporalJoin.intervalJoin(intervals, points, "user_id", "lo", "hi", "ts", w)
          .select(col("iv_id"), col("event_id")))
      assert(got == want, s"bucketMicros=$w diverged from the theta-join")
    }
  }

  test("intervalJoin boundary: lo exclusive, hi inclusive") {
    val intervals = Seq((1L, 0L, 100L, 200L)).toDF("user_id", "iv_id", "lo", "hi")
    val points = frame(Seq((1L, 100L, 1L, 0.0), (1L, 101L, 2L, 0.0),
      (1L, 200L, 3L, 0.0), (1L, 201L, 4L, 0.0)))
    val got = TemporalJoin.intervalJoin(intervals, points, "user_id", "lo", "hi", "ts", 50L)
      .select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(2L, 3L))
  }
}
