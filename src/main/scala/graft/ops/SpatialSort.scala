package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expr.functions._

/** Locality-preserving reorder / partitioning (SURVEY.md §2.6 spatial
  * sort; reference: apps/gdalalg_vector_sort.cpp:40 hilbert|strtree
  * methods). The Hilbert code IS the engine's explicit range-partitioning
  * story: rows close on the curve are close in space, so
  * repartitionByRange(hilbert) gives each task a spatially compact slab —
  * downstream joins and scans touch few cells per partition. */
object SpatialSort {

  /** Sort rows by Hilbert curve distance (stable global order). */
  def sortByHilbert(df: DataFrame, lonCol: String, latCol: String, order: Int = 16): DataFrame =
    df.withColumn("__hilbert", hilbert_code(col(lonCol), col(latCol), order))
      .orderBy(col("__hilbert"))
      .drop("__hilbert")

  /** Range-partition by Hilbert code (the write-side locality layout);
    * keeps the code column as `hilbert` for bucketing/pruning use. */
  def partitionByHilbert(df: DataFrame, lonCol: String, latCol: String,
                         numPartitions: Int, order: Int = 16): DataFrame =
    df.withColumn("hilbert", hilbert_code(col(lonCol), col(latCol), order))
      .repartitionByRange(numPartitions, col("hilbert"))
      .sortWithinPartitions(col("hilbert"))
}
