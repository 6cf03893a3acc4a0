package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.expr.KmeansModel
import graft.expr.functions.{kmeans_assign, quantize_emb}

/** Distributed Lloyd's k-means over quantized embeddings — the coarse-
  * quantizer TRAINER closing the loop on the IVF/IVF-PQ search paths
  * (`Ann.ivfTopK` / `Ann.ivfPqTopK` take their centroid sets as input;
  * reference analog: the k-means any IVF index trains before search,
  * cf. the IndexIVF family those queries cite).
  *
  * Exactness discipline (the q99/q127 algebra carried into training):
  *   - points are component-quantized once: qx_i = round(v_i·2^20) —
  *     int64, exact for float inputs (see KmeansKernels.quantize);
  *   - assignment is argmin_j ‖c_j‖² − 2·qx·c_j (reduced L2 — the ‖qx‖²
  *     term cancels), ties to the lowest j, all int64;
  *   - Lloyd's update is the floor-division centroid
  *     c'_{j,i} = floorDiv(Σ_{x∈j} qx_i, |j|), keeping every centroid in
  *     the SAME int64 component domain — so the next iteration's argmin
  *     is again exact, and the whole trajectory (every assignment, every
  *     centroid, every distance) is re-derivable in DuckDB SQL.
  *
  * Scale shape: per iteration ONE codegen'd map (assignment; centroids
  * ride the expression as a broadcast-referenced model object) and ONE
  * hash aggregation producing k×(d+2) longs — partial aggregation
  * (map-side combine) means the shuffle carries k rows per task, never
  * the corpus. Only those k rows reach the driver. No iteration-growing
  * lineage: each round's frame is rebuilt from the one persisted
  * quantized scan.
  */
object Kmeans {
  /** Trained model + the final-round per-cluster summary:
    * (cell, n, qx_sum, score, qc_sum) where `score` is the summed reduced
    * distance of members to the centroid they were assigned to (the
    * pre-update centroid of the last round) and `qc_sum` is the POST-
    * update centroid's component sum — together they pin both halves of
    * the last Lloyd's step. */
  final case class Fit(model: KmeansModel, summary: DataFrame)

  /** Train k centroids for `iters` Lloyd's rounds.
    *
    * Init is deterministic: the k rows with the smallest `idCol` seed the
    * centroids in id order (centroid j = quantized embedding of the j-th
    * smallest id). Clusters that lose all members keep their previous
    * centroid (the reference behavior that keeps k stable).
    */
  def fit(points: DataFrame, idCol: String, embCol: String,
          k: Int, iters: Int): Fit = {
    require(k >= 1 && k <= 65536, "k-means coarse quantizer: 1 <= k <= 65536")
    require(iters >= 1, "at least one Lloyd's round")
    val spark = points.sparkSession

    val q = graft.pipeline.Spread.toCores(points)
      .select(col(idCol).cast("long").as("p_id"), quantize_emb(col(embCol)).as("qx"))
    val qp = graft.pipeline.Caches.persist(q)

    // deterministic seeding: k smallest ids, in id order (top-k, no full sort)
    val seed = qp.orderBy(col("p_id")).limit(k).collect()
    require(seed.length == k, s"k-means: need at least k=$k points, got ${seed.length}")
    var cents: Array[Array[Long]] = seed.map(_.getSeq[Long](1).toArray)
    val d = cents(0).length

    var summary: DataFrame = null
    var it = 0
    while (it < iters) {
      val model = KmeansModel(cents)
      val assigned = qp
        .withColumn("ad", kmeans_assign(col("qx"), model))
        .withColumn("cell", element_at(col("ad"), 1).cast("int"))
      // one object-hash-agg job: cluster size, member-distance sum, and the
      // component sums as ONE elementwise vector aggregate — d separate
      // sum(element_at) expressions made the first compile pay ~12 s of
      // whole-stage codegen at d=64 (and would not survive d=768 at all);
      // the buffer is k×d longs either way.
      val rows = assigned.groupBy("cell")
        .agg(count(lit(1)).as("n"),
             sum(element_at(col("ad"), 2)).as("score"),
             graft.expr.functions.vec_sum(col("qx")).as("s"))
        .collect()

      val next = cents.map(_.clone()) // empty clusters keep their centroid
      rows.foreach { r =>
        val j = r.getInt(0)
        val n = r.getLong(1)
        val s = r.getSeq[Long](3)
        next(j) = Array.tabulate(d)(i => Math.floorDiv(s(i), n))
      }
      cents = next
      if (it == iters - 1) summary = buildSummary(spark, rows, cents)
      it += 1
    }
    graft.pipeline.Caches.drop(qp)
    Fit(KmeansModel(cents), summary)
  }

  /** k-row summary frame from the last round's collected aggregates —
    * cell, n, qx_sum (Σ members Σ_i qx_i), score, qc_sum (post-update
    * centroid component sum). Driver-built: k×(d+2) longs by contract. */
  private def buildSummary(spark: SparkSession, rows: Array[Row],
                           cents: Array[Array[Long]]): DataFrame = {
    val out = rows.toSeq.sortBy(_.getInt(0)).map { r =>
      val j = r.getInt(0)
      val qxSum = r.getSeq[Long](3).sum
      Row(j, r.getLong(1), qxSum, r.getLong(2), cents(j).sum)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](out.asJava),
      StructType(Seq(
        StructField("cell", IntegerType, nullable = false),
        StructField("n", LongType, nullable = false),
        StructField("qx_sum", LongType, nullable = false),
        StructField("score", LongType, nullable = false),
        StructField("qc_sum", LongType, nullable = false))))
  }
}
