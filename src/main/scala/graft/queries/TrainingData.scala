package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Ann, Dedup}
import graft.text.textfunctions._

/** Training-data pipeline operators over the documents/embeddings tables:
  * deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity
  * search (brute-force + LSH ANN), and text analysis (language ID, quality
  * scoring, token counting, fingerprinting). Exact-arithmetic outputs carry
  * DuckDB oracles; hash-family internals are rows-only + ScalaTest.
  */
object TrainingData {
  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  val defs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // exact dedup on content hash
    ("q40_dedup_exact", (s: SparkSession, dir: String) => {
      Dedup.exact(docs(s, dir))
    }, Some("""
      SELECT md5(text) AS text_md5, count(*) AS n_dups, min(doc_id) AS keep_id
      FROM documents GROUP BY 1""")),

    // token counting + quality ratios (whitespace-run tokenizer via exact
    // length arithmetic so the oracle matches to the last bit)
    ("q41_token_stats", (s: SparkSession, dir: String) => {
      docs(s, dir).select(
        col("doc_id"),
        length(col("text")).as("len"),
        ((length(col("text")) - length(regexp_replace(col("text"), " ", ""))) + 1).as("n_tokens"),
        (length(col("text")) - length(regexp_replace(col("text"), "[aeiou]", ""))).as("n_vowels"))
        .withColumn("avg_token_len",
          (col("len") - (col("n_tokens") - 1)).cast("double") / col("n_tokens").cast("double"))
    }, Some("""
      SELECT doc_id, len, n_tokens, n_vowels,
             CAST((len - (n_tokens - 1)) AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_token_len
      FROM (
        SELECT doc_id,
          CAST(length(text) AS INT) AS len,
          CAST((length(text) - length(replace(text, ' ', ''))) + 1 AS INT) AS n_tokens,
          CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS INT) AS n_vowels
        FROM documents)""")),

    // quality scoring: stopword-hit ratio (non-overlapping replace count)
    ("q42_quality_score", (s: SparkSession, dir: String) => {
      val theHits = ((length(col("text")) - length(regexp_replace(col("text"), " the ", ""))) / lit(5)).cast("int")
      val nTokens = (length(col("text")) - length(regexp_replace(col("text"), " ", ""))) + 1
      docs(s, dir).select(
        col("doc_id"), col("source"),
        theHits.as("stopword_hits"),
        nTokens.as("n_tokens"),
        floor((theHits * 1000000).cast("double") / nTokens).cast("bigint").as("quality_ppm"))
    }, Some("""
      SELECT doc_id, source, stopword_hits, n_tokens,
             CAST(floor(CAST(stopword_hits * 1000000 AS DOUBLE) / n_tokens) AS BIGINT) AS quality_ppm
      FROM (
        SELECT doc_id, source,
          CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS INT) AS stopword_hits,
          CAST((length(text) - length(replace(text, ' ', ''))) + 1 AS INT) AS n_tokens
        FROM documents)""")),

    // grouped corpus profile per (source, lang)
    ("q43_corpus_profile", (s: SparkSession, dir: String) => {
      docs(s, dir).groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(length(col("text"))).as("min_len"),
          max(length(col("text"))).as("max_len"))
    }, Some("""
      SELECT source, lang, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             CAST(min(length(text)) AS INT) AS min_len,
             CAST(max(length(text)) AS INT) AS max_len
      FROM documents GROUP BY source, lang""")),

    // brute-force cosine/dot top-k, integer-quantized (order-free exact)
    ("q44_cosine_topk", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      Ann.bruteTopK(queries, cands, k = 5)
    }, Some(s"""
      WITH scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id,
               (SELECT CAST(sum(CAST(round((CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)) * ${Ann.Scale}) AS BIGINT)) AS BIGINT)
                FROM unnest(generate_series(1, 64)) AS t(i)) AS score
        FROM embeddings q, embeddings c
        WHERE q.vec_id < 10)
      SELECT q_id, c_id, score, rank FROM (
        SELECT q_id, c_id, score,
               CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS INT) AS rank
        FROM scored) WHERE rank <= 5""")),

    // quantized norms (embedding hygiene metric)
    ("q45_embedding_norms", (s: SparkSession, dir: String) => {
      emb(s, dir).select(col("vec_id"), col("label"), Ann.qnorm("embedding").as("qnorm2"))
    }, Some(s"""
      SELECT vec_id, label,
             (SELECT CAST(sum(CAST(round((CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)) * ${Ann.Scale}) AS BIGINT)) AS BIGINT)
              FROM unnest(generate_series(1, 64)) AS t(i)) AS qnorm2
      FROM embeddings""")),

    // ---- rows-only (hash-family internals; ScalaTest covers semantics) ----

    ("q46_minhash_lsh", (s: SparkSession, dir: String) => {
      Dedup.minhashCandidates(docs(s, dir), k = 64, bands = 16, shingle = 5)
    }, None),

    // nChunks = 11 ⇒ pigeonhole guarantees recall for Hamming ≤ 10
    ("q47_simhash_neardup", (s: SparkSession, dir: String) => {
      Dedup.simhashCandidates(docs(s, dir), maxHamming = 10, nChunks = 11)
    }, None),

    // 4-chunk simhash here is a HEURISTIC pre-filter (recall guaranteed
    // only to Hamming ≤ 3) feeding the exact Jaccard verify
    ("q48_ngram_jaccard", (s: SparkSession, dir: String) => {
      val cand = Dedup.simhashCandidates(docs(s, dir), maxHamming = 16)
        .select(col("id_a"), col("id_b"))
      Dedup.jaccardVerify(cand, docs(s, dir), shingle = 3)
        .select(col("id_a"), col("id_b"), col("inter"), col("uni"))
    }, None),

    ("q49_lang_id", (s: SparkSession, dir: String) => {
      docs(s, dir).select(col("doc_id"), col("lang").as("lang_labeled"),
        lang_id(col("text")).as("lang_pred"),
        doc_fingerprint(col("text")).as("fingerprint"),
        simhash64(col("text")).as("simhash"))
    }, None),

    ("q50_ann_lsh", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      Ann.lshTopK(queries, cands, k = 5, nBits = 16, bands = 4)
    }, None),

    // multimodal: opaque binary + typed metadata → decode/feature plumbing
    // (image decode is real JVM code; see q30 for stats — here: per-format
    // feature rows incl. a deterministic stub for non-image payloads)
    ("q51_multimodal_features", (s: SparkSession, dir: String) => {
      graft.gen.Fixtures.imagesFromParts(s, dir)
        .filter(col("key") % 5 === 0)
        .withColumn("p", graft.expr.functions.image_profile(col("bytes"), col("fmt"), col("w"), col("h")))
        .select(col("image_id"), col("fmt"),
          length(col("bytes")).as("payload_bytes"),
          col("p.mean").as("mean_px"),
          col("p.phash").as("phash"))
    }, None)
  )
}
