package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.text.textfunctions._
import scala.jdk.CollectionConverters._

/** Similarity search over an embedding column (array<float>).
  *
  * Scoring is an integer-quantized dot product: per-component products are
  * rounded to 1/2^20 units and summed as int64 — float-exact (a float×float
  * product is exact in double) and ORDER-FREE, so scores are identical
  * under any partitioning/aggregation order and bit-comparable against a
  * SQL oracle. Ranking is total-ordered by (score desc, id).
  *
  * Scoring rides the codegen'd `quantized_dot` expression
  * (expr/AnnExpressions.scala), not a UDF — Spark's builtin HOFs are
  * interpreted, and the dot product is the hot loop of every verify.
  */
object Ann {
  val Scale = 1048576L // 2^20

  /** Quantized dot product column of two array<float> columns — the
    * codegen'd [[graft.expr.QuantizedDot]], bit-identical to the SQL
    * `aggregate(zip_with(...round(x*y*Scale)...))` formulation the
    * oracles use (see AnnExpressions.scala for the exactness argument). */
  def qdot(a: String, b: String): org.apache.spark.sql.Column =
    graft.expr.functions.quantized_dot(col(a), col(b))

  /** Brute-force exact top-k: queries(q_id, q_emb) × cands(c_id, c_emb).
    * Query side is broadcast (it's the small side by construction); the
    * candidate scan stays partition-parallel with no shuffle until the
    * per-query top-k window. */
  /** Shared scoring/ranking contract: quantized-dot score, total order
    * (score desc, c_id), top-k — `pairs` must carry q_emb and c_emb. */
  private def rankTopK(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("c_id"))
    pairs
      .withColumn("score", qdot("q_emb", "c_emb"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("score"), col("rank"))
  }

  def bruteTopK(queries: DataFrame, cands: DataFrame, k: Int): DataFrame =
    // the scoring scan must fan across cores even for narrow-split inputs
    rankTopK(graft.pipeline.Spread.toCores(cands).crossJoin(broadcast(queries)), k)

  /** LSH-bucketed approximate top-k: both sides get an nBits random-
    * hyperplane signature; candidates are fetched from buckets agreeing on
    * ≥1 of `bands` signature bands, then ranked exactly. Recall < 1 by
    * construction; the scale path when brute force is too wide.
    *
    * Shuffle discipline: the banded frames carry ONLY (band, bkey, id) —
    * embedding vectors never ride the band explode or act as shuffle/
    * compare keys. Multi-band collisions dedup on the (q_id, c_id) id
    * pair; embeddings re-attach afterwards by id equi-join (query side
    * broadcast). */
  def lshTopK(queries: DataFrame, cands: DataFrame, k: Int,
              nBits: Int = 16, bands: Int = 4, seed: Long = 42L): DataFrame = {
    val rowsPerBand = nBits / bands
    val mask = (1L << rowsPerBand) - 1
    def banded(df: DataFrame, idCol: String, embCol: String) =
      df.withColumn("__sig", rademacher_sig(
          expr(s"transform($embCol, x -> cast(x as double))"), nBits, seed))
        .select(col(idCol), posexplode(
          expr(s"transform(sequence(0, ${bands - 1}), b -> (__sig >> (b * $rowsPerBand)) & $mask)"))
          .as(Seq("band", "bkey")))
    val spreadCands = graft.pipeline.Spread.toCores(cands)
    val qb = banded(queries, "q_id", "q_emb")
    val cb = banded(spreadCands, "c_id", "c_emb")
    rankTopK(
      qb.join(cb, Seq("band", "bkey"))
        .select(col("q_id"), col("c_id"))
        .dropDuplicates("q_id", "c_id") // a pair may collide in several bands
        .join(broadcast(queries), Seq("q_id"))
        .join(cands, Seq("c_id")), k)
  }

  /** Quantized squared L2 norm (same exactness discipline). */
  def qnorm(embCol: String): org.apache.spark.sql.Column =
    graft.expr.functions.quantized_dot(col(embCol), col(embCol))

  /** Quantized dot product of an embedding column against a literal
    * centroid vector (codegen'd HOFs, no UDF). */
  private def qdotLit(embCol: org.apache.spark.sql.Column,
                      cent: Array[Float]): org.apache.spark.sql.Column =
    graft.expr.functions.quantized_dot(embCol, typedLit(cent.toSeq))

  /** Collected (cent_id ascending) centroid list, guarded — a coarse
    * quantizer is a small driver-side object, like a GCP set. */
  private def collectCentroids(centroids: DataFrame): Array[(Int, Array[Float])] = {
    val rows = centroids.select(col("cent_id").cast("int"), col("cent_emb"))
      .limit(65537).collect()
    require(rows.length <= 65536, "IVF coarse quantizer must be a small centroid set")
    rows.map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
  }

  /** REDUCED quantized L2 distance to centroid j: qnormC_j − 2·qdot(x,c_j)
    * (the ‖x‖² term is row-constant and cancels in the argmin; both terms
    * are exact int64 under the Scale quantization, so assignment is
    * order-free and SQL-mirrorable). */
  private def reducedDist(embCol: org.apache.spark.sql.Column,
                          cent: Array[Float]): org.apache.spark.sql.Column = {
    var qn = 0L
    var i = 0
    while (i < cent.length) {
      val v = cent(i).toDouble
      qn += math.round((v * v) * Scale)
      i += 1
    }
    lit(qn) - lit(2L) * qdotLit(embCol, cent)
  }

  /** Nearest-centroid cell id as a SHUFFLE-FREE map over the rows (the
    * IVF inverted-list assignment): argmin of the reduced distances,
    * ties to the lowest cent_id (array_position finds the first
    * minimum; centroids are ordered by id). */
  def ivfCell(embCol: org.apache.spark.sql.Column,
              cents: Array[(Int, Array[Float])]): org.apache.spark.sql.Column = {
    val dists = array(cents.map(c => reducedDist(embCol, c._2)): _*)
    element_at(
      typedLit(cents.map(_._1).toSeq),
      array_position(dists, array_min(dists)).cast("int"))
  }

  /** Exact driver-side mirror of [[reducedDist]]: identical int64 algebra
    * with Spark's `round` semantics per dot component (Round on a double
    * is BigDecimal HALF_UP — java's Math.round differs on negative .5
    * ties), so the cells chosen here are bit-identical to the former
    * in-plan derivation and to the SQL oracle. */
  private def reducedDistDriver(emb: Array[Float], cent: Array[Float]): Long = {
    var qn = 0L; var dot = 0L; var i = 0
    while (i < cent.length) {
      val v = cent(i).toDouble
      qn += math.round((v * v) * Scale)
      dot += java.math.BigDecimal.valueOf(emb(i).toDouble * v * Scale)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      i += 1
    }
    qn - 2L * dot
  }

  /** IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    * path alongside lshTopK: candidates are assigned to their nearest
    * centroid's list by a map-only argmin; each query probes its `nprobe`
    * nearest lists and re-ranks those candidates exactly (the classic
    * IndexIVFFlat search shape). Recall < 1 when the true neighbor's
    * list is not probed; nprobe = #centroids degenerates to bruteTopK
    * order. The candidate side is never exploded or shuffled before the
    * per-query top-k window.
    *
    * The query side is broadcast-sized BY CONTRACT (it rides broadcast
    * joins), so it is collected once and its nprobe-nearest probe cells
    * are computed at plan time from the already-collected centroid array
    * — one tiny collect job instead of a #queries×#centroids explode +
    * window (which cost ~10 Spark jobs for 50 output rows). */
  def ivfTopK(queries: DataFrame, cands: DataFrame, centroids: DataFrame,
              nprobe: Int, k: Int): DataFrame = {
    val spark = queries.sparkSession
    val cents = collectCentroids(centroids)
    require(nprobe >= 1 && nprobe <= cents.length, "1 <= nprobe <= #centroids")
    val qProj = queries.select(col("q_id"), col("q_emb"))
    val qRows = qProj.limit(65537).collect()
    require(qRows.length <= 65536, "IVF query side must be broadcast-sized")
    // probe cells per query: nprobe nearest by (reduced distance, cent_id)
    val probeRows: Seq[org.apache.spark.sql.Row] = qRows.toSeq.flatMap { r =>
      val emb = r.getSeq[Float](1).toArray
      cents.map { case (cid, c) => (cid, reducedDistDriver(emb, c)) }
        .sortBy { case (cid, d) => (d, cid) }
        .take(nprobe)
        .map { case (cid, _) => org.apache.spark.sql.Row(r.get(0), cid) }
    }
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val qCells = spark.createDataFrame(
      new java.util.ArrayList(probeRows.asJava),
      StructType(Seq(qProj.schema("q_id"), StructField("cell", IntegerType, nullable = false))))
    // re-rank side rebuilt from the SAME collected rows (no second scan)
    val qLocal = spark.createDataFrame(new java.util.ArrayList(qRows.toSeq.asJava), qProj.schema)
    val assigned = graft.pipeline.Spread.toCores(cands)
      .withColumn("cell", ivfCell(col("c_emb"), cents))
    rankTopK(
      assigned.join(broadcast(qCells), Seq("cell"))
        .join(broadcast(qLocal), Seq("q_id")), k)
  }

  /** Exact-int64 quantized squared component: round(v²·Scale). */
  private def q2(v: Double): Long = graft.expr.PqKernels.qround(v * v * Scale.toDouble)

  /** IVF-PQ approximate top-k (the IndexIVFPQ search shape): candidates
    * are coarse-assigned by the shuffle-free argmin and PQ-encoded — the
    * residual against the cell centroid is product-quantized into `m`
    * sub-codes by a codegen'd per-row expression. Each query precomputes,
    * per probed cell, an m×ksub asymmetric-distance lookup table
    * DRIVER-SIDE (queries, centroids, and codebooks are all small by
    * contract); scoring a candidate is then m int64 adds
    * (Σ_s lut[s][code_s]) — no embedding vector ever rides the probe
    * join. All quantization uses the component-rounded int64 algebra of
    * [[qdot]], so assignment, codes, and ADC scores are bit-mirrorable
    * in SQL (q127's oracle re-derives all three).
    *
    * At 100 TB the codes column (m bytes/vector class) is the point:
    * re-ranking reads 32× less than raw embeddings; an exact re-rank on
    * the ADC top-k' would re-attach embeddings by id for k' rows only. */
  def ivfPqTopK(queries: DataFrame, cands: DataFrame, centroids: DataFrame,
                codebooks: Array[Array[Array[Float]]],
                nprobe: Int, k: Int): DataFrame = {
    val spark = queries.sparkSession
    val cents = collectCentroids(centroids)
    require(nprobe >= 1 && nprobe <= cents.length, "1 <= nprobe <= #centroids")
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val qn = codebooks.map(_.map(c => c.map(v => q2(v.toDouble)).sum))
    val model = graft.expr.PqModel(cents.toMap, codebooks, qn, m, dsub)

    val qProj = queries.select(col("q_id"), col("q_emb"))
    val qRows = qProj.limit(65537).collect()
    require(qRows.length <= 65536, "IVF-PQ query side must be broadcast-sized")

    // per query: nprobe nearest cells + an m×ksub ADC LUT per cell
    // lut(s)(c) = Σ_i round(((q_i − cent_i) − cb_i)²·Scale)
    val lutRows: Seq[org.apache.spark.sql.Row] = qRows.toSeq.flatMap { r =>
      val emb = r.getSeq[Float](1).toArray
      cents.map { case (cid, c) => (cid, reducedDistDriver(emb, c)) }
        .sortBy { case (cid, d) => (d, cid) }
        .take(nprobe)
        .map { case (cid, _) =>
          val cent = model.cents(cid)
          val lut: Seq[Seq[Long]] = (0 until m).map { s =>
            (0 until codebooks(s).length).map { c =>
              var acc = 0L
              var i = 0
              while (i < dsub) {
                val gi = s * dsub + i
                val diff = (emb(gi).toDouble - cent(gi).toDouble) -
                  codebooks(s)(c)(i).toDouble
                acc += q2(diff)
                i += 1
              }
              acc
            }
          }
          org.apache.spark.sql.Row(r.get(0), cid, lut)
        }
    }
    import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructField, StructType}
    val qLut = spark.createDataFrame(
      new java.util.ArrayList(lutRows.asJava),
      StructType(Seq(qProj.schema("q_id"),
        StructField("cell", IntegerType, nullable = false),
        StructField("lut", ArrayType(ArrayType(LongType, containsNull = false), containsNull = false), nullable = false))))

    val assigned = graft.pipeline.Spread.toCores(cands)
      .withColumn("cell", ivfCell(col("c_emb"), cents))
      .withColumn("codes", graft.expr.functions.pq_encode(col("c_emb"), col("cell"), model))
      .select(col("c_id"), col("cell"), col("codes"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc").asc, col("c_id"))
    assigned.join(broadcast(qLut), Seq("cell"))
      .withColumn("adc", graft.expr.functions.pq_adc(col("codes"), col("lut")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("adc"), col("rank"))
  }
}
