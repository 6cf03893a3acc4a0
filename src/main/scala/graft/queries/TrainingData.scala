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

    // language ID is pure token/stopword counting — fully re-derived in
    // SQL (tokens = whitespace split; score = stopword hits; tie → CJK
    // share first, then max score with lexicographic tiebreak)
    ("q49_lang_id", (s: SparkSession, dir: String) => {
      docs(s, dir).select(col("doc_id"), col("lang").as("lang_labeled"),
        lang_id(col("text")).as("lang_pred"))
    }, Some {
      val profiles = Map(
        "en" -> Seq("the", "of", "and", "to", "in", "is", "it", "that", "for", "on", "with", "as", "at", "this"),
        "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "den", "von", "für"),
        "fr" -> Seq("le", "la", "les", "et", "est", "une", "un", "des", "du", "pour", "dans", "que", "pas"),
        "es" -> Seq("el", "la", "los", "las", "y", "es", "una", "un", "de", "en", "que", "por", "para", "no"))
      val scoreSelects = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
        val inList = words.map(w => s"'$w'").mkString(", ")
        s"SELECT doc_id, '$lang' AS lang, len(list_filter(ts, x -> x IN ($inList))) AS score FROM toks"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH toks AS (
        SELECT doc_id, lang AS lang_labeled, text,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ts
        FROM documents),
      scores AS (
        $scoreSelects),
      best AS (
        SELECT doc_id, lang, score,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
        FROM scores)
      SELECT t.doc_id, t.lang_labeled,
        CASE
          WHEN (length(t.text) - length(regexp_replace(t.text, '[\\x{4e00}-\\x{9fff}]', '', 'g'))) * 4
               >= length(t.text) THEN 'zh'
          WHEN len(t.ts) = 0 OR b.score = 0 THEN 'und'
          ELSE b.lang
        END AS lang_pred
      FROM toks t JOIN best b ON t.doc_id = b.doc_id AND b.rn = 1"""
    }),

    // document fingerprinting + simhash (rolling/hash internals — not
    // SQL-expressible; specs pin determinism and order sensitivity)
    ("q52_fingerprints", (s: SparkSession, dir: String) => {
      docs(s, dir).select(col("doc_id"),
        doc_fingerprint(col("text")).as("fingerprint"),
        simhash64(col("text")).as("simhash"))
    }, None),

    // exact 3-gram Jaccard over a DETERMINISTIC pair list (consecutive
    // doc ids) — the verify kernel itself under the oracle (distinct
    // char-trigram set overlap re-derived in SQL)
    ("q53_jaccard_oracle", (s: SparkSession, dir: String) => {
      val d = docs(s, dir).filter(length(col("text")) >= 3)
      val pairs = d.select(col("doc_id").as("id_a"))
        .join(d.select(col("doc_id").as("id_b")), col("id_b") === col("id_a") + 1)
      Dedup.jaccardVerify(pairs, docs(s, dir), shingle = 3)
        .select(col("id_a"), col("id_b"), col("inter"), col("uni"))
    }, Some("""
      WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 3),
      tri AS (
        SELECT DISTINCT doc_id, substr(text, i, 3) AS g
        FROM d, LATERAL (SELECT unnest(generate_series(1, length(text) - 2)) AS i)),
      sizes AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY doc_id),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM d a JOIN d b ON b.doc_id = a.doc_id + 1),
      ov AS (
        SELECT p.id_a, p.id_b, count(*) AS inter
        FROM pairs p
        JOIN tri ta ON ta.doc_id = p.id_a
        JOIN tri tb ON tb.doc_id = p.id_b AND tb.g = ta.g
        GROUP BY p.id_a, p.id_b)
      SELECT p.id_a, p.id_b,
        CAST(coalesce(o.inter, 0) AS INT) AS inter,
        CAST(sa.n + sb.n - coalesce(o.inter, 0) AS INT) AS uni
      FROM pairs p
      JOIN sizes sa ON sa.doc_id = p.id_a
      JOIN sizes sb ON sb.doc_id = p.id_b
      LEFT JOIN ov o ON o.id_a = p.id_a AND o.id_b = p.id_b""")),

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
