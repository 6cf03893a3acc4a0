package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles over a BOUNDED discrete value domain —
  * the corpus-profiling aggregation (token-count deciles per language,
  * images-per-cell skew profile before picking a salt factor, chip
  * sizes per shard). Exactness matters for reproducible data cards;
  * `percentile_approx` answers drift with partitioning.
  *
  * Shape: histogram first — `groupBy(grp, value).count()` benefits from
  * map-side combine, so the shuffle carries one row per DISTINCT
  * (group, value), not per input row; the running-sum window then runs
  * over distinct values only. The per-group window is therefore bounded
  * by the VALUE DOMAIN (token counts, cell occupancies — thousands),
  * never by corpus rows; for genuinely unbounded domains pre-bucket the
  * value (log-scale bins) or rank through `Sharding.groupedRank`.
  *
  * Definition: p{q} = min v such that |{rows ≤ v}| ≥ ceil(q·n/100) —
  * the inverse-CDF / `quantile_disc` convention, integer-exact (the
  * ceil compares as 100·cum ≥ q·n, no division).
  */
object Quantiles {
  /** Null handling: null VALUES are excluded from the profile (and from
    * `n`) — they have no place in an order statistic, and engines
    * disagree on null sort position (Spark windows sort nulls FIRST,
    * ANSI nulls last), so admitting them would silently skew every
    * p-value. Null GROUP KEYS are kept as their own group (null-safe
    * join below — a plain equi-join would silently drop the
    * null-language stratum). */
  def profile(df: DataFrame, grpCol: String, valCol: String, qs: Seq[Int]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 100), "percentiles in [1,100]")
    // persisted: the histogram feeds BOTH the running-sum window and the
    // per-group totals — without it each leg re-scans and re-aggregates
    // the corpus (2 full scans where 1 suffices at 100 TB)
    val counts = graft.pipeline.Caches.persist(
      df.filter(col(valCol).isNotNull)
        .groupBy(col(grpCol), col(valCol)).agg(count(lit(1)).as("__c")))
    val cum = counts.withColumn("__cum",
      sum(col("__c")).over(Window.partitionBy(grpCol).orderBy(valCol)))
    val tot = counts.groupBy(col(grpCol)).agg(sum(col("__c")).as("n"))
      .withColumnRenamed(grpCol, "__tg")
    val aggs = qs.map(q =>
      min(when(col("__cum") * 100 >= col("n") * q, col(valCol))).as(s"p$q"))
    cum.join(tot, col(grpCol) <=> col("__tg"))
      .groupBy(col(grpCol), col("n"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
