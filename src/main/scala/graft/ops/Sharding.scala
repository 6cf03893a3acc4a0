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
      .withColumn("end_bin",
        expr(s"(tok_offset + ${nTokCol} - 1) div ${capacity}L").cast("long"))
      .withColumn("bins_spanned", (col("end_bin") - col("start_bin") + 1L).cast("int"))
      .withColumn("start_off_in_bin", pmod(col("tok_offset"), lit(capacity)).cast("int"))
  }
}
