package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus relevance scoring — BM25 top-k retrieval over the documents
  * table (the "which training docs match this probe query" primitive of a
  * data-curation pipeline).
  *
  * Scale shape: for a FIXED query-term set (the retrieval case; terms are
  * broadcast-sized by construction) no token explode ever happens — per-doc
  * term frequencies are codegen'd `size(filter(split(...)))` projections,
  * corpus statistics (N, total length, per-term document frequencies)
  * reduce to ONE aggregate row crossJoined (broadcast) back, and the final
  * top-k is a TakeOrdered — two corpus scans, zero wide shuffles.
  *
  * Scoring: Okapi BM25 with k1 = 1.2, b = 0.75. Two idf flavors:
  *  - `logIdf = true` (default): the textbook ln(1 + (N−df+½)/(df+½)).
  *  - `logIdf = false`: the UN-LOGGED Robertson ratio (N−df+½)/(df+½) =
  *    (2N−2df+1)/(2df+1). Per-term this is a monotone transform of the
  *    textbook idf, and — because k1/b are dyadic rationals — it makes the
  *    whole score exact-rational: numerator/denominator are int64 values
  *    (tf-norm = 22·tf·S / (10·tf·S + 3·S + 9·dl·N) after clearing
  *    avdl = S/N), so a SQL oracle reproduces every double bit-for-bit
  *    with one division per factor and a spelled-out summation order.
  */
object Relevance {

  /** Per-term BM25 factor columns; `n`, `s` (corpus size / total token
    * count) and `df` arrive as columns of the broadcast stats row. */
  private def termScore(tf: Column, dl: Column, n: Column, s: Column,
                        df: Column, logIdf: Boolean): Column = {
    val idfRatio = (lit(2L) * n - lit(2L) * df + lit(1L)).cast("double") /
      (lit(2L) * df + lit(1L)).cast("double")
    val idf = if (logIdf) log(idfRatio + lit(1.0)) else idfRatio
    val tfn = (lit(22L) * tf * s).cast("double") /
      (lit(10L) * tf * s + lit(3L) * s + lit(9L) * dl * n).cast("double")
    idf * tfn
  }

  /** Top-k documents for `terms` by BM25. Output: (doc_id, dl, tf_<term>…,
    * score, rank) — rank dense over score DESC with id tiebreak. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
               idCol: String = "doc_id", textCol: String = "text",
               logIdf: Boolean = true): DataFrame = {
    require(terms.nonEmpty && terms.size <= 32, "fixed probe-term set (≤32)")
    require(terms.forall(t => !t.contains("'") && !t.contains(" ")), "terms are single tokens")
    val tfCols = terms.map(t =>
      expr(s"cast(size(filter(split($textCol, ' '), x -> x = '$t')) as bigint)").as(s"tf_$t"))
    val base = docs.select(
      (col(idCol) +: expr(s"cast(size(split($textCol, ' ')) as bigint)").as("dl") +: tfCols): _*)
    // one aggregate row: corpus size, total token count, per-term doc freq
    val statCols = sum(col("dl")).as("__s") +: terms.map(t =>
      sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"__df_$t"))
    val stats = base.agg(count(lit(1)).as("__n"), statCols: _*)
    val scored = base.crossJoin(broadcast(stats))
    // fixed left-to-right summation order — mirrored verbatim in the oracle
    val score = terms.map(t =>
      termScore(col(s"tf_$t"), col("dl"), col("__n"), col("__s"),
        col(s"__df_$t"), logIdf)).reduceLeft(_ + _)
    // top-k FIRST via orderBy.limit (TakeOrdered — per-partition heaps, no
    // single-partition global sort); the rank window then runs over k rows
    val top = scored.withColumn("score", score)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col(idCol))).cast("int"))
      .select((col(idCol) +: col("dl") +: terms.map(t => col(s"tf_$t")) :+
        col("score") :+ col("rank")): _*)
  }

  /** DSIR-style importance resampling (hashed bag-of-words flavor of Xie
    * et al. 2023, "Data Selection for Language Models via Importance
    * Resampling"): docs from the RAW pool are scored by how much more
    * their hashed-unigram profile resembles a small TARGET slice than the
    * pool itself, and the top-k survive.
    *
    * Exactness discipline: with per-bucket counts tc/rc and totals T/R,
    * the textbook per-token log weight ln((tc/T)/(rc/R)) is replaced by
    * the integer LLR surrogate (tc·R − rc·T) — same sign, same target-vs-
    * raw direction, exact int64 — so the per-doc score Σ_tokens surrogate
    * is order-free integer arithmetic a SQL oracle reproduces bit-for-bit
    * (no ln() ULP hazard across engines). Buckets must be a power of two:
    * the bucket id is the UNSIGNED residue of the fnv-1a hash, and signed
    * `pmod` only equals the unsigned residue when the modulus divides
    * 2^64.
    *
    * Scale shape: one token explode (persisted — counts and scoring reuse
    * it), a two-phase hash-agg down to `buckets` rows broadcast back onto
    * the token frame, one map-side-combined per-doc agg, TakeOrdered
    * top-k. No corpus-sized wide op beyond the per-doc agg. */
  def dsirTopK(docs: DataFrame, isTarget: Column, k: Int,
               idCol: String = "doc_id", textCol: String = "text",
               buckets: Int = 256): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0, "buckets must be a power of two")
    import graft.text.textfunctions.fnv64
    val toks = graft.pipeline.Caches.persist(
      docs.select(col(idCol), isTarget.as("__tgt"),
          explode(split(col(textCol), "\\s+")).as("__tok"))
        .filter(col("__tok") =!= "")
        .withColumn("__hb", fnv64(col("__tok")).bitwiseAND(lit((buckets - 1).toLong))))
    val cnt = toks.groupBy(col("__hb"))
      .agg(sum(when(col("__tgt"), 1L).otherwise(0L)).as("__tc"),
        sum(when(!col("__tgt"), 1L).otherwise(0L)).as("__rc"))
    // totals ride the same tiny frame: one extra agg over `buckets` rows
    val tot = cnt.agg(sum(col("__tc")).as("__t"), sum(col("__rc")).as("__r"))
    val weights = cnt.crossJoin(broadcast(tot))
      .select(col("__hb"),
        (col("__tc") * col("__r") - col("__rc") * col("__t")).as("__w"))
    toks.filter(!col("__tgt"))
      .join(broadcast(weights), "__hb")
      .groupBy(col(idCol))
      .agg(sum(col("__w")).as("score"), count(lit(1)).as("n_toks"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
