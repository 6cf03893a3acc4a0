package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.text.textfunctions._

/** Similarity search over an embedding column (array<float>).
  *
  * Scoring is an integer-quantized dot product: per-component products are
  * rounded to 1/2^20 units and summed as int64 — float-exact (a float×float
  * product is exact in double) and ORDER-FREE, so scores are identical
  * under any partitioning/aggregation order and bit-comparable against a
  * SQL oracle. Ranking is total-ordered by (score desc, id).
  *
  * Built from codegen'd builtin HOFs (`zip_with`/`aggregate`), not UDFs.
  */
object Ann {
  val Scale = 1048576L // 2^20

  /** Quantized dot product column of two array<float> columns. */
  def qdot(a: String, b: String): org.apache.spark.sql.Column =
    expr(s"""aggregate(
      zip_with($a, $b, (x, y) -> cast(round(cast(x as double) * cast(y as double) * $Scale) as bigint)),
      0L, (acc, v) -> acc + v)""")

  /** Brute-force exact top-k: queries(q_id, q_emb) × cands(c_id, c_emb).
    * Query side is broadcast (it's the small side by construction); the
    * candidate scan stays partition-parallel with no shuffle until the
    * per-query top-k window. */
  def bruteTopK(queries: DataFrame, cands: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("c_id"))
    // the scoring scan must fan across cores even for narrow-split inputs
    graft.pipeline.Spread.toCores(cands).crossJoin(broadcast(queries))
      .withColumn("score", qdot("q_emb", "c_emb"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("score"), col("rank"))
  }

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
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("c_id"))
    qb.join(cb, Seq("band", "bkey"))
      .select(col("q_id"), col("c_id"))
      .dropDuplicates("q_id", "c_id") // a pair may collide in several bands
      .join(broadcast(queries), Seq("q_id"))
      .join(cands, Seq("c_id"))
      .withColumn("score", qdot("q_emb", "c_emb"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("score"), col("rank"))
  }

  /** Quantized squared L2 norm (same exactness discipline). */
  def qnorm(embCol: String): org.apache.spark.sql.Column =
    expr(s"""aggregate(
      zip_with($embCol, $embCol, (x, y) -> cast(round(cast(x as double) * cast(y as double) * $Scale) as bigint)),
      0L, (acc, v) -> acc + v)""")
}
