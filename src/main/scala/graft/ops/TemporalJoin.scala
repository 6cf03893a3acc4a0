package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal joins for event streams: as-of (attach the most recent build
  * row at-or-before each probe row's timestamp, per key) and bucketed
  * interval join (pair each point row with every interval it falls in,
  * per key). The reference engine has neither (documented n/a in SURVEY
  * §2.3); both are standard analytics-engine operators (kdb `aj`, Flink
  * temporal join, DuckDB ASOF JOIN) and first-class needs of a training-
  * data pipeline (attribute each sample to the latest upstream state;
  * window samples against collection intervals).
  *
  * Scale shape — the naive as-of formulation is a per-key unbounded
  * window (`last(value) OVER (PARTITION BY key ORDER BY ts)` over the
  * whole union frame): one hot key funnels its entire history through a
  * single task's sort. This implementation is the two-phase prefix shape
  * (the [[Sharding.packShards]] pattern in time): rows sub-bucket by a
  * fixed time granule, per-(key, granule) windows run in parallel, and
  * the cross-granule carry travels through a granule-level aggregate
  * frame that is smaller than the row frame by the rows-per-granule
  * factor. A key's window sort is bounded by its densest granule, not
  * its full history; the carry window is bounded by the key's TIME SPAN
  * over `bucketMicros`, not its row count. Join results are exact and
  * invariant to the granule choice (TemporalJoinSpec asserts parity
  * across widths and vs the naive single-window plan).
  */
object TemporalJoin {

  /** As-of join: for every probe row, the build row of the same key with
    * the greatest (ts, ord) such that build.ts <= probe.ts (inclusive;
    * build rows tie-sort before probe rows at equal ts, and among builds
    * with equal ts the greatest `ordCol` wins — the deterministic
    * last-writer rule). Probes with no preceding build get nulls.
    *
    * @param probe    left side; ALL its columns pass through
    * @param build    right side; only `attach` columns are emitted
    * @param keyCol   equi-key present on both sides
    * @param tsCol    timestamp column (TimestampType) on both sides
    * @param ordCol   integer tie-break column on both sides (unique per
    *                 (key, ts) on the build side for determinism)
    * @param attach   build-source-column -> output-name pairs
    * @param bucketMicros time granule; any value >= 1 gives identical
    *                 results — pick so a key's densest granule fits a
    *                 task (e.g. 1 day) and its span/granule count stays
    *                 far below the row count
    */
  def asOf(probe: DataFrame, build: DataFrame, keyCol: String, tsCol: String,
           ordCol: String, attach: Seq[(String, String)],
           bucketMicros: Long = 86400000000L): DataFrame = {
    require(bucketMicros >= 1, "positive bucket width")
    require(attach.nonEmpty, "attach at least one build column")
    val bStruct = struct(attach.map { case (src, out) => col(src).as(out) }: _*)
    val b2 = build.select(col(keyCol).as("__k"), unix_micros(col(tsCol).cast("timestamp")).as("__tsu"),
      col(ordCol).cast("long").as("__ord"), lit(0).as("__side"), bStruct.as("__bp"))
    val bpType = b2.schema("__bp").dataType
    val probeRow = struct(probe.columns.map(col).toIndexedSeq: _*)
    val p2 = probe.select(col(keyCol).as("__k"), unix_micros(col(tsCol).cast("timestamp")).as("__tsu"),
      col(ordCol).cast("long").as("__ord"), lit(1).as("__side"),
      lit(null).cast(bpType).as("__bp"), probeRow.as("__prow"))
    val prType = p2.schema("__prow").dataType
    val u = b2.withColumn("__prow", lit(null).cast(prType))
      .unionByName(p2)
      .withColumn("__tb", expr(s"__tsu div ${bucketMicros}L"))

    // phase 1 (parallel over granules): within-granule running last build.
    // PERSISTED: the frame feeds both the probe side and the carry
    // derivation below — without the cache the carry branch re-scans and
    // re-shuffles the corpus (column pruning makes its Exchange differ
    // from the probe branch's, so AQE stage reuse never fires; verified
    // empirically). Released by the harness via pipeline.Caches.release().
    val w1 = Window.partitionBy(col("__k"), col("__tb"))
      .orderBy(col("__tsu"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withIn = graft.pipeline.Caches.persist(
      u.withColumn("__in", last(col("__bp"), ignoreNulls = true).over(w1)))

    // phase 2 (granule-level carry): each granule's last build, then the
    // running last across granules EXCLUSIVE of the current one. Derived
    // FROM the windowed frame — a granule's FINAL row's running-last IS
    // its last build (null when build-free) — so this branch shares
    // withIn's lineage up to the (key, granule) Exchange and Spark
    // REUSES that shuffle instead of scanning the corpus a second time;
    // the aggregate's grouping matches the existing partitioning (no new
    // corpus-sized Exchange). Covers every granule that has any row
    // (probe or build), so a probe in a build-free granule still
    // receives the carry. The (tsu, side, ord) struct prefix is a total
    // order per (key, granule) (ord is unique per side), so max() picks
    // exactly the window-final row.
    val lastPer = withIn.groupBy(col("__k"), col("__tb"))
      .agg(max(struct(col("__tsu"), col("__side"), col("__ord"), col("__in"))).as("__m"))
      .select(col("__k"), col("__tb"), col("__m.__in").as("__lastb"))
    val wc = Window.partitionBy(col("__k")).orderBy(col("__tb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = lastPer
      .withColumn("__carry", last(col("__lastb"), ignoreNulls = true).over(wc))
      .select(col("__k").as("__ck"), col("__tb").as("__ctb"), col("__carry"))

    // null-safe key AND granule equality: a null key is one more group,
    // and a null timestamp (null granule) is one more granule — both
    // matching the window semantics of the naive plan (nulls sort first:
    // null-ts builds precede everything, null-ts probes see only them),
    // not a silent row drop
    val probes = withIn.filter(col("__side") === 1)
    val matched = probes
      .join(carry, col("__k") <=> col("__ck") && col("__tb") <=> col("__ctb"))
      .withColumn("__m", coalesce(col("__in"), col("__carry")))
    matched.select(
      probe.columns.toIndexedSeq.map(c => col(s"__prow.`$c`").as(c)) ++
        attach.map { case (_, out) => col(s"__m.`$out`").as(out) }: _*)
  }

  /** Reference shape for [[asOf]] — ONE unbounded per-key window over the
    * union frame. Correct, and the right plan when no key is hot; kept
    * public as the parity target for TemporalJoinSpec. */
  def asOfNaive(probe: DataFrame, build: DataFrame, keyCol: String, tsCol: String,
                ordCol: String, attach: Seq[(String, String)]): DataFrame = {
    val bStruct = struct(attach.map { case (src, out) => col(src).as(out) }: _*)
    val b2 = build.select(col(keyCol).as("__k"), unix_micros(col(tsCol).cast("timestamp")).as("__tsu"),
      col(ordCol).cast("long").as("__ord"), lit(0).as("__side"), bStruct.as("__bp"))
    val bpType = b2.schema("__bp").dataType
    val probeRow = struct(probe.columns.map(col).toIndexedSeq: _*)
    val p2 = probe.select(col(keyCol).as("__k"), unix_micros(col(tsCol).cast("timestamp")).as("__tsu"),
      col(ordCol).cast("long").as("__ord"), lit(1).as("__side"),
      lit(null).cast(bpType).as("__bp"), probeRow.as("__prow"))
    val prType = p2.schema("__prow").dataType
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__tsu"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b2.withColumn("__prow", lit(null).cast(prType))
      .unionByName(p2)
      .withColumn("__m", last(col("__bp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        probe.columns.toIndexedSeq.map(c => col(s"__prow.`$c`").as(c)) ++
          attach.map { case (_, out) => col(s"__m.`$out`").as(out) }: _*)
  }

  /** Bucketed interval join: every (interval-row, point-row) pair of the
    * same key with loCol < point.ts <= hiCol (half-open lookback — the
    * attribution-window convention; an interval row carries its bounds
    * as epoch-micros longs). Inner multiplicity: each qualifying pair
    * exactly once.
    *
    * Scale shape: the theta-join is banded into an equi-join — each
    * interval explodes to its covered time granules (at most
    * span/bucketMicros + 1 rows; callers keep spans bounded), each point
    * lands in exactly one granule, and the join key is (key, granule),
    * so Spark plans a plain shuffled/broadcast hash join with AQE skew
    * handling instead of a cartesian per key. The granule width trades
    * interval fan-out against bucket density; results are invariant to
    * it.
    *
    * Column collisions: point columns shadow interval columns of the
    * same name — rename beforehand (the spec's fixtures keep them
    * disjoint).
    */
  def intervalJoin(intervals: DataFrame, points: DataFrame, keyCol: String,
                   loCol: String, hiCol: String, tsCol: String,
                   bucketMicros: Long = 3600000000L): DataFrame = {
    require(bucketMicros >= 1, "positive bucket width")
    val iv = intervals
      .withColumn("__tb", explode(sequence(
        expr(s"`$loCol` div ${bucketMicros}L"), expr(s"`$hiCol` div ${bucketMicros}L"))))
    val pt = points
      .withColumn("__ptsu", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("__tb", expr(s"__ptsu div ${bucketMicros}L"))
      .withColumnRenamed(keyCol, "__pk")
    iv.join(pt, iv(keyCol) === pt("__pk") && iv("__tb") === pt("__tb")
        && col("__ptsu") > col(loCol) && col("__ptsu") <= col(hiCol))
      .drop("__tb", "__pk", "__ptsu")
  }
}
