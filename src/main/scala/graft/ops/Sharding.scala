package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-export shard packing (the WebDataset/tar-shard recipe): lay
  * the corpus out in a deterministic global order and cut it into
  * fixed-byte-budget shards, so a training loader streams size-balanced
  * files. A sample whose bytes straddle a boundary belongs to the shard
  * its FIRST byte falls in (the standard streaming pack — shards overrun
  * the target by at most one sample, never underrun it except the last).
  *
  * shard_id(row) = floor(prefix_bytes_before(row) / targetBytes), with
  * prefix taken over the global (orderCol) order.
  *
  * Scale shape: the naive formulation — one `Window.orderBy(id)` with no
  * partition — serializes the whole corpus through a single task. This
  * is the textbook two-phase distributed scan instead: (1) per-BUCKET
  * byte subtotals (a map-side-combined aggregate down to |buckets|
  * rows), exclusive-prefix-summed on the driver in bucket order and
  * broadcast back; (2) a per-bucket exclusive running sum (one Exchange
  * keyed by bucket, every bucket's window sorts in parallel) plus its
  * bucket's offset. The caller supplies `bucket`, any MONOTONE integer
  * function of the order key (id div 4096, a date bucket, …) — shard
  * assignment is invariant to the granularity choice (ShardingSpec
  * asserts this); granularity only tunes parallelism vs per-bucket sort
  * size, so pick |buckets| well above the cluster's core count.
  */
object Sharding {

  /** Hard cap on the collected per-bucket subtotal list. */
  val MaxBuckets = 4000000

  /** Adds (cum_before, shard_id) to `df`. `orderCol` must be globally
    * unique (ties would make the prefix ambiguous); `bucket` must be
    * monotone non-decreasing in `orderCol`. */
  def packShards(df: DataFrame, orderCol: String, bytesCol: String,
                 targetBytes: Long, bucket: Column): DataFrame = {
    require(targetBytes >= 1, "positive shard byte budget")
    val spark = df.sparkSession
    val bucketed = df.withColumn("pack_bucket", bucket.cast("long"))

    // phase 1: bucket subtotals -> driver exclusive prefix (|buckets| rows)
    val subtotals = bucketed.groupBy("pack_bucket")
      .agg(sum(col(bytesCol).cast("long")).as("b_bytes"))
      .limit(MaxBuckets + 1).collect()
    require(subtotals.length <= MaxBuckets,
      s"Sharding: bucket expression yields more than $MaxBuckets buckets — coarsen it")
    val sorted = subtotals.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = new Array[(Long, Long)](sorted.length)
    var acc = 0L
    var i = 0
    while (i < sorted.length) {
      offsets(i) = (sorted(i)._1, acc)
      acc += sorted(i)._2
      i += 1
    }
    val offsetDf = spark.createDataFrame(offsets.toSeq)
      .toDF("pack_bucket", "bucket_offset")

    // phase 2: per-bucket exclusive running sum + broadcast offset join
    val w = Window.partitionBy(col("pack_bucket")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(offsetDf), Seq("pack_bucket"))
      .withColumn("cum_before",
        col("bucket_offset") + coalesce(sum(col(bytesCol).cast("long")).over(w), lit(0L)))
      .withColumn("shard_id", expr(s"cum_before div ${targetBytes}L").cast("long"))
      .drop("pack_bucket", "bucket_offset")
  }

  /** Global 1-based rank of each row WITHIN its group, in ascending
    * (`hashCol`, `orderCol`) order, without ever sorting a whole group in
    * one task — the window-shaped sibling of [[packShards]]'s two-phase
    * prefix. Rows sub-bucket by `hashCol div step` (monotone in the order
    * key, so cross-sub-bucket order is total); a per-(group, sub-bucket)
    * count aggregate (map-side combined, |groups|·`subBuckets` rows max)
    * yields exclusive offsets via a window over that SMALL frame; each
    * row's rank = its sub-bucket's offset + its rank inside the
    * per-(group, sub-bucket) window. A group holding 50% of the corpus
    * therefore sorts across `subBuckets` tasks instead of one. Optionally
    * also attaches the group total (from the same small frame — no extra
    * corpus pass). `hashCol` must be non-negative and < `hashRange`.
    *
    * Adds: `rk` (long, 1-based global in-group rank) and, when
    * `withGroupTotal`, `grp_n` (long). */
  def groupedRank(df: DataFrame, groupCols: Seq[String], hashCol: String,
                  orderCol: String, subBuckets: Int = 256,
                  hashRange: Long = 1000000L,
                  withGroupTotal: Boolean = false): DataFrame = {
    require(subBuckets >= 1, "positive sub-bucket count")
    val step = (hashRange + subBuckets - 1) / subBuckets
    val g = groupCols.map(col)
    val bucketed = df.withColumn("__sb", (col(hashCol).cast("long") / step).cast("int"))

    // small frame: per-(group, sub-bucket) counts -> exclusive offsets
    val offW = Window.partitionBy(g: _*).orderBy(col("__sb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val grpW = Window.partitionBy(g: _*)
    var offs = bucketed.groupBy((g :+ col("__sb")): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(offW), lit(0L)))
    if (withGroupTotal) offs = offs.withColumn("grp_n", sum(col("__n")).over(grpW))
    offs = offs.drop("__n")

    // per-(group, sub-bucket) local rank + broadcast offset
    val rkW = Window.partitionBy((g :+ col("__sb")): _*)
      .orderBy(col(hashCol), col(orderCol))
    bucketed
      .join(broadcast(offs), groupCols :+ "__sb")
      .withColumn("rk", col("__off") + row_number().over(rkW).cast("long"))
      .drop("__sb", "__off")
  }

  /** Concat-and-chunk sequence packing (the GPT-pretraining layout): lay
    * documents out in the global `orderCol` order, concatenate their
    * token streams, and cut every `capacity` tokens — each document
    * reports the fixed-length training sequences it lands in. Documents
    * ARE split across sequence boundaries (that is the point of the
    * layout: zero padding, total_bins = ceil(total_tokens/capacity)).
    *
    * Same two-phase distributed prefix scan as [[packShards]] (which
    * supplies `cum_before`) — no global-order window ever runs.
    * Zero-token documents are dropped: they occupy no position in the
    * token stream. */
  def packSequences(df: DataFrame, orderCol: String, nTokCol: String,
                    capacity: Long, bucket: Column): DataFrame = {
    // start_off_in_bin (< capacity) and bins_spanned are emitted as int;
    // capacities beyond Int.MaxValue would silently wrap them negative
    require(capacity >= 1 && capacity <= Int.MaxValue,
      s"sequence capacity in [1, ${Int.MaxValue}] (got $capacity)")
    packShards(df.filter(col(nTokCol) > 0), orderCol, nTokCol, capacity, bucket)
      .withColumnRenamed("cum_before", "tok_offset")
      .withColumnRenamed("shard_id", "start_bin")
      // Column arithmetic via a fixed-name temp: interpolating nTokCol
      // raw into expr() would mis-parse names needing backtick quoting
      .withColumn("__last_tok", col("tok_offset") + col(nTokCol).cast("long") - 1L)
      .withColumn("end_bin", expr(s"__last_tok div ${capacity}L").cast("long"))
      .drop("__last_tok")
      .withColumn("bins_spanned", (col("end_bin") - col("start_bin") + 1L).cast("int"))
      .withColumn("start_off_in_bin", pmod(col("tok_offset"), lit(capacity)).cast("int"))
  }
}
