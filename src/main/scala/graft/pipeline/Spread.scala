package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-heavy per-row kernels (signatures, quantized
  * dot products, decodes). A small corpus/dimension parquet often arrives
  * in one or two splits, which pins the whole kernel pass to that many
  * tasks — the q35 lesson (see Fixtures.imagesFromParts) generalized. At
  * production scale the input has at least as many splits as cores and
  * this is a NO-OP, so the repartition shuffle is paid exactly when it
  * buys parallelism and never on a 100 TB corpus that is already wide.
  */
object Spread {
  /** `df`, repartitioned to the session's parallelism iff it currently
    * plans fewer partitions. */
  def toCores(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }
}
