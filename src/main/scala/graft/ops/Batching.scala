package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aspect-ratio bucketing + batch packing — the multimodal training
  * batch-shaping pass (the SDXL/NovelAI bucketed-batching recipe): images
  * may only share a batch if they share a resolution bucket, so the
  * loader groups by nearest aspect bucket and emits fixed-size batches,
  * dropping each bucket's incomplete tail.
  *
  * Exactness discipline: "nearest aspect" is decided without any
  * division — the distance of (w, h) to bucket i = (bw, bh) is
  * |w·bh − h·bw| / (h·bh); multiplying through by h·D (D = a common
  * multiple of every bh) turns every pairwise comparison into the
  * integer score_i = |w·bh_i − h·bw_i| · (D / bh_i), argmin with ties to
  * the LOWEST bucket index. Batch order inside a bucket is the
  * deterministic (sample_bucket(id), id) hash order of the sampling
  * family.
  *
  * Scale shape: bucket assignment is a per-row codegen'd when-chain over
  * |buckets| integer scores (metadata only — W/H columns, no decode);
  * the only wide op is the per-bucket rank window, one Exchange keyed by
  * bucket. |buckets| is a small constant (5–20 in practice).
  */
object Batching {
  /** The SDXL-ish default bucket list (bw : bh). */
  val DefaultBuckets: Seq[(Int, Int)] = Seq((1, 1), (4, 3), (3, 4), (16, 9), (9, 16))

  private def lcm(a: Long, b: Long): Long = {
    @annotation.tailrec def gcd(x: Long, y: Long): Long = if (y == 0) x else gcd(y, x % y)
    a / gcd(a, b) * b
  }

  /** Integer argmin bucket index of (w, h) over `buckets`, ties → lowest
    * index (the when-chain probes indices in order). */
  def aspectBucket(w: Column, h: Column, buckets: Seq[(Int, Int)] = DefaultBuckets): Column = {
    require(buckets.nonEmpty && buckets.forall { case (bw, bh) => bw > 0 && bh > 0 },
      "positive bucket ratios")
    val d = buckets.map(_._2.toLong).reduce(lcm)
    require(d <= 1000000L, "bucket-height lcm too large for int64 score headroom")
    val scores = buckets.zipWithIndex.map { case ((bw, bh), i) =>
      abs(w.cast("long") * bh - h.cast("long") * bw) * lit(d / bh)
    }
    val best = least(scores: _*)
    scores.zipWithIndex.tail.foldLeft(when(scores.head === best, 0)) {
      case (acc, (s, i)) => acc.when(s === best, i)
    }.cast("int")
  }

  /** Assign full fixed-size batches per bucket: deterministic
    * (sample_bucket(id), id) order, batch_id = (rk−1) div batchSize,
    * the incomplete tail batch dropped. Output adds bucket/rk/batch_id.
    *
    * Rank comes from [[graft.ops.Sharding.groupedRank]]'s two-phase
    * prefix, never a whole-bucket window: |buckets| ≈ 5 means a naive
    * `Window.partitionBy(bucket)` sorts ~corpus/5 rows in ONE task each
    * (and a trailing `count().over(bucket)` would add a second full-group
    * pass). The prefix spreads each bucket across the sub-buckets, and
    * the tail-drop total `grp_n` falls out of the same small count frame
    * — no second corpus pass. */
  def packBatches(df: DataFrame, idCol: String, wCol: String, hCol: String,
                  batchSize: Int,
                  buckets: Seq[(Int, Int)] = DefaultBuckets,
                  subBuckets: Int = 256): DataFrame = {
    require(batchSize >= 1, "positive batch size")
    val ranked = Sharding.groupedRank(
      df.withColumn("bucket", aspectBucket(col(wCol), col(hCol), buckets))
        .withColumn("sbucket", graft.text.textfunctions.sample_bucket(col(idCol))),
      Seq("bucket"), hashCol = "sbucket", orderCol = idCol,
      subBuckets = subBuckets, withGroupTotal = true)
    ranked
      .filter(col("rk") <= expr(s"(grp_n div $batchSize) * $batchSize"))
      .withColumn("batch_id", expr(s"(rk - 1) div $batchSize").cast("int"))
      .withColumn("rk", col("rk").cast("int"))
      .drop("sbucket", "grp_n")
  }
}
