package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.columnar.InMemoryRelation
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Parallelism guard for CPU-heavy per-row kernels (signatures, quantized
  * dot products, decodes). A small corpus/dimension parquet often arrives
  * in one or two splits, which pins the whole kernel pass to that many
  * tasks — the q35 lesson (see Fixtures.imagesFromParts) generalized. At
  * production scale the input has at least as many splits as cores and
  * this is a NO-OP, so the repartition shuffle is paid exactly when it
  * buys parallelism and never on a 100 TB corpus that is already wide.
  */
object Spread {
  /** `df`, repartitioned to the session's parallelism iff its estimated
    * plan width is narrower. */
  def toCores(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (estimatedWidth(df) >= p) df else df.repartition(p)
  }

  /** Plan-side width estimate that never forces physical planning (the
    * former `.rdd.getNumPartitions` probe instantiated the full RDD
    * lineage outside AQE on every operator call — double planning).
    *
    * If the subtree contains any exchange-introducing operator, its width
    * is the session's shuffle partition count; a user Repartition wins
    * with its explicit count. Otherwise width is the narrowest it could
    * scan: file sources ≈ max(#files, bytes/maxPartitionBytes); cached
    * frames report their materialized partitioning; unknown leaves
    * (local/range fixtures) claim 0 so the kernel pass gets spread —
    * repartitioning an already-wide unknown costs one no-gain shuffle on
    * a small frame, the cheap direction of the tradeoff. */
  private def estimatedWidth(df: DataFrame): Int = {
    val conf = df.sparkSession.sessionState.conf
    val plan = df.queryExecution.optimizedPlan
    val wide = plan.collectFirst {
      case r: Repartition if r.shuffle => r.numPartitions
      case r: RepartitionByExpression => r.optNumPartitions.getOrElse(conf.numShufflePartitions)
      case _: Join | _: Aggregate | _: Window | _: Sort | _: Distinct | _: Deduplicate =>
        conf.numShufflePartitions
    }
    wide.getOrElse {
      val leafWidths = plan.collectLeaves().map {
        case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
          val fs = lr.relation.asInstanceOf[HadoopFsRelation]
          val files = fs.location.inputFiles.length
          val bySize = (fs.location.sizeInBytes.max(0L) /
            math.max(1L, conf.filesMaxPartitionBytes)).toInt
          math.max(files, bySize)
        case m: InMemoryRelation =>
          m.cachedPlan.outputPartitioning.numPartitions
        case _ => 0
      }
      if (leafWidths.isEmpty) 0 else leafWidths.min
    }
  }
}
