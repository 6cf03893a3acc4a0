package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Ann, Dedup, Kmeans}
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

  // ---- SQL re-derivations of the hash kernels (TextKernels.scala) ----
  // DuckDB BIGINT arithmetic is overflow-checked, so every 2^64 wrap
  // routes through HUGEINT `% 2^64` and casts back to UBIGINT; signed
  // comparisons convert explicitly. These helpers are shared by the
  // q46/q47/q48/q52 oracles.

  /** 2^64 as a decimal literal. */
  private[queries] val U64 = "18446744073709551616"

  /** Shared oracle CTE chain re-deriving the IVF top-k search (q99's
    * exact int64 algebra: centroid self-norms, reduced quantized L2,
    * argmin assignment, nprobe-nearest probe cells, exact re-rank
    * scores). Ends at `scored` (q_id, c_id, score); q99 ranks it to
    * rank ≤ 5, q153 intersects it with the brute top-k for recall. */
  private lazy val ivfScoredCtes: String = s"""qn AS (
        SELECT CAST(n_nationkey AS INT) AS cent_id,
          (SELECT CAST(sum(CAST(round((
             (CAST((n_nationkey*31 + (i-1)*17) % 64 - 32 AS DOUBLE)/32)
             * (CAST((n_nationkey*31 + (i-1)*17) % 64 - 32 AS DOUBLE)/32)) * ${Ann.Scale}) AS BIGINT)) AS BIGINT)
           FROM unnest(generate_series(1, 64)) AS t(i)) AS qnc
        FROM nation),
      dist AS (
        SELECT e.vec_id, q.cent_id,
          q.qnc - 2 * (SELECT CAST(sum(CAST(round((CAST(e.embedding[i] AS DOUBLE)
                         * (CAST((q.cent_id*31 + (i-1)*17) % 64 - 32 AS DOUBLE)/32)) * ${Ann.Scale}) AS BIGINT)) AS BIGINT)
                       FROM unnest(generate_series(1, 64)) AS t(i)) AS d
        FROM embeddings e, qn q),
      acell AS (
        SELECT vec_id AS c_id, cent_id AS cell FROM (
          SELECT vec_id, cent_id,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cent_id) AS rn
          FROM dist) WHERE rn = 1),
      qcell AS (
        SELECT vec_id AS q_id, cent_id AS cell FROM (
          SELECT vec_id, cent_id,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cent_id) AS rn
          FROM dist WHERE vec_id < 10) WHERE rn <= 3),
      scored AS (
        SELECT qc.q_id, a.c_id,
          (SELECT CAST(sum(CAST(round((CAST(q.embedding[i] AS DOUBLE)
                     * CAST(c.embedding[i] AS DOUBLE)) * ${Ann.Scale}) AS BIGINT)) AS BIGINT)
           FROM unnest(generate_series(1, 64)) AS t(i)) AS score
        FROM qcell qc JOIN acell a ON a.cell = qc.cell
        JOIN embeddings q ON q.vec_id = qc.q_id
        JOIN embeddings c ON c.vec_id = a.c_id)"""

  /** Shared oracle CTE chain replaying the q130 k-means trajectory
    * (k=4, iters=2, d=64, min-id seeding) exactly: px = quantized
    * components, c0 = seed centroids, d/a/u/c 1–2 = per-round reduced
    * distances, argmin assignments, component sums, floorDiv updates.
    * Ends at `c2` (the trained model); q130 summarizes the last round,
    * q131 assigns the corpus against c2. */
  private lazy val kmeansTrajectoryCtes: String = s"""px AS (
        SELECT vec_id, i,
               CAST(round(CAST(embedding[i] AS DOUBLE) * ${Ann.Scale}) AS BIGINT) AS q
        FROM embeddings, unnest(generate_series(1, 64)) AS t(i)),
      c0 AS (SELECT CAST(vec_id AS INT) AS j, i, q FROM px WHERE vec_id < 4),
      d1 AS (
        SELECT p.vec_id, c.j,
               CAST(sum(c.q * c.q) - 2 * sum(p.q * c.q) AS BIGINT) AS d
        FROM px p JOIN c0 c ON c.i = p.i GROUP BY p.vec_id, c.j),
      a1 AS (SELECT vec_id, j AS cell, d FROM (
               SELECT vec_id, j, d,
                      row_number() OVER (PARTITION BY vec_id ORDER BY d, j) AS rn
               FROM d1) WHERE rn = 1),
      u1 AS (SELECT a.cell AS j, p.i, CAST(sum(p.q) AS BIGINT) AS s,
                    CAST(count(*) AS BIGINT) AS n
             FROM a1 a JOIN px p ON p.vec_id = a.vec_id GROUP BY a.cell, p.i),
      c1 AS (SELECT c0.j, c0.i,
                    COALESCE(CAST(floor(CAST(u1.s AS DOUBLE) / u1.n) AS BIGINT), c0.q) AS q
             FROM c0 LEFT JOIN u1 ON u1.j = c0.j AND u1.i = c0.i),
      d2 AS (
        SELECT p.vec_id, c.j,
               CAST(sum(c.q * c.q) - 2 * sum(p.q * c.q) AS BIGINT) AS d
        FROM px p JOIN c1 c ON c.i = p.i GROUP BY p.vec_id, c.j),
      a2 AS (SELECT vec_id, j AS cell, d FROM (
               SELECT vec_id, j, d,
                      row_number() OVER (PARTITION BY vec_id ORDER BY d, j) AS rn
               FROM d2) WHERE rn = 1),
      u2 AS (SELECT a.cell AS j, p.i, CAST(sum(p.q) AS BIGINT) AS s,
                    CAST(count(*) AS BIGINT) AS n
             FROM a2 a JOIN px p ON p.vec_id = a.vec_id GROUP BY a.cell, p.i),
      c2 AS (SELECT c1.j, c1.i,
                    COALESCE(CAST(floor(CAST(u2.s AS DOUBLE) / u2.n) AS BIGINT), c1.q) AS q
             FROM c1 LEFT JOIN u2 ON u2.j = c1.j AND u2.i = c1.i)"""

  /** FNV-1a 64 over the `n`-char substring of `col` starting at 1-based
    * index `i` — unrolled (no recursion), yields UBIGINT. */
  private def fnvSql(colName: String, i: String, n: Int): String =
    (0 until n).foldLeft("CAST(14695981039346656037 AS UBIGINT)") { (h, k) =>
      val c = s"CAST(unicode(substr($colName, $i + $k, 1)) AS UBIGINT)"
      s"CAST(((CAST(xor($h, $c) AS HUGEINT) * 1099511628211) % $U64) AS UBIGINT)"
    }

  /** Whitespace-token CTE: `toks0(doc_id, tok)`, one row per token
    * OCCURRENCE (the Spark `split(\\s+)` + nonempty filter mirror). */
  private def toks0Cte: String = s"""toks0 AS (
        SELECT doc_id, t.tok FROM documents,
          LATERAL (SELECT unnest(string_split_regex(text, '\\s+')) AS tok) t
        WHERE t.tok <> '')"""

  /** Recursive per-token FNV-1a 64 chain over a source CTE exposing
    * (rid, tok): yields `fnv(rid, pos, h)`; the finished hash per row is
    * `fnv WHERE pos = length(tok)`. The ONE definition of the token-hash
    * arithmetic — shared by the simhash, HLL and CMS oracles (divergent
    * copies would let the oracles silently drift apart). Must be spliced
    * after `WITH RECURSIVE`. */
  private def fnvChainCte(src: String): String = s"""fnv(rid, pos, h) AS (
        SELECT rid, 0, CAST(14695981039346656037 AS UBIGINT) FROM $src
        UNION ALL
        SELECT f.rid, f.pos + 1,
          CAST(((CAST(xor(f.h, CAST(unicode(substr(t.tok, f.pos + 1, 1)) AS UBIGINT)) AS HUGEINT)
                 * 1099511628211) % $U64) AS UBIGINT)
        FROM fnv f JOIN $src t ON t.rid = f.rid
        WHERE f.pos < length(t.tok))"""

  /** CTE chain computing every doc's simhash64: whitespace tokens →
    * per-token FNV-1a via a recursive CTE → 64 generated bit-vote sums
    * (no 64× explode) → `shu(doc_id, u UBIGINT)`, 0 for token-free docs.
    * Must be spliced after `WITH RECURSIVE`. */
  private def simhashCtes: String = {
    val votes = (0 until 64)
      .map(b => s"sum(CAST((h >> $b) & 1 AS BIGINT)) AS c$b").mkString(", ")
    val bits = (0 until 64)
      .map(b => s"CASE WHEN (2*c$b) > n THEN CAST(${java.math.BigInteger.ONE.shiftLeft(b)} AS HUGEINT) ELSE CAST(0 AS HUGEINT) END")
      .mkString(" + ")
    s"""$toks0Cte,
      toks AS (SELECT row_number() OVER (ORDER BY doc_id) AS rid, doc_id, tok FROM toks0),
      ${fnvChainCte("toks")},
      tokh AS (
        SELECT t.doc_id, f.h FROM fnv f JOIN toks t ON t.rid = f.rid WHERE f.pos = length(t.tok)),
      votes AS (SELECT doc_id, count(*) AS n, $votes FROM tokh GROUP BY doc_id),
      shx AS (SELECT doc_id, ($bits) AS u FROM votes),
      shu AS (
        SELECT d.doc_id, CAST(coalesce(s.u, CAST(0 AS HUGEINT)) AS UBIGINT) AS u
        FROM documents d LEFT JOIN shx s ON d.doc_id = s.doc_id)"""
  }

  /** `(band, divisor, mask)` VALUES rows mirroring Dedup.simhashCandidates'
    * chunk layout: chunk c covers bits [64c/n, 64(c+1)/n). */
  private def chunkDef(n: Int): String =
    (0 until n).map { c =>
      val s = 64 * c / n
      val len = 64 * (c + 1) / n - s
      val mask = java.math.BigInteger.ONE.shiftLeft(len).subtract(java.math.BigInteger.ONE)
      s"($c, CAST(${java.math.BigInteger.ONE.shiftLeft(s)} AS UBIGINT), CAST($mask AS UBIGINT))"
    }.mkString(", ")

  /** CTEs deriving simhash candidate pairs `cand(id_a, id_b, hamming)`
    * (expects `shu` from [[simhashCtes]] in scope). */
  private def simhashPairCtes(nChunks: Int): String = s"""
      cdef(band, dv, mask) AS (VALUES ${chunkDef(nChunks)}),
      chunks AS (
        SELECT doc_id, u, c.band, (u // c.dv) & c.mask AS val FROM shu, cdef c),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.u, b.u)) AS INT) AS hamming
        FROM chunks a JOIN chunks b
          ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id)"""

  /** CTE chain re-deriving every fixture image's 64-bit perceptual hash
    * (GeoKernels.phashOfRaster) in exact integer SQL: 8×8 block sums of the
    * pattern pixels, the lcm-cleared rational mean test
    * (64·D·s_i > T·n_i), bit-weight summation in HUGEINT, and the 4×16-bit
    * multi-index band split of Dedup.hammingNearDup. Yields
    * `hpairs(id_a, id_b, hamming)` — every banded candidate pair with its
    * exact Hamming distance. */
  private def phashPairCtes: String = {
    val powers = (0 until 64).map(i => java.math.BigInteger.ONE.shiftLeft(i)).mkString("[", ", ", "]")
    s"""phimg AS (
        SELECT p_partkey AS key,
          CASE (p_partkey % 4) WHEN 0 THEN 16 WHEN 1 THEN 20 WHEN 2 THEN 64 ELSE 256 END AS sz
        FROM part),
      hrows AS (SELECT key, sz, unnest(generate_series(0, sz - 1)) AS py FROM phimg),
      hpx AS (SELECT key, sz, py, unnest(generate_series(0, sz - 1)) AS px FROM hrows),
      hcells AS MATERIALIZED (
        SELECT key, sz, ((8 * py + 7) // sz) * 8 + ((8 * px + 7) // sz) AS ci,
               sum(((px * 7) + (py * 13) + (key * 31)) % 256) AS s, count(*) AS n
        FROM hpx GROUP BY key, sz, ci),
      himg AS (
        SELECT key, CASE sz WHEN 20 THEN 36 ELSE (sz // 8) * (sz // 8) END AS d FROM phimg),
      htot AS (
        SELECT c.key, sum(c.s * (i.d // c.n)) AS t
        FROM hcells c JOIN himg i ON i.key = c.key GROUP BY c.key),
      hsig AS MATERIALIZED (
        SELECT q.key, q.u,
          CAST(CASE WHEN q.u >= 9223372036854775808 THEN q.u - $U64 ELSE q.u END AS BIGINT) AS h
        FROM (
          SELECT c.key,
            sum(CASE WHEN c.s * 64 * i.d > t.t * c.n
                THEN ($powers)[c.ci + 1] ELSE CAST(0 AS HUGEINT) END) AS u
          FROM hcells c JOIN himg i ON i.key = c.key JOIN htot t ON t.key = c.key
          GROUP BY c.key) q),
      hrep AS MATERIALIZED (SELECT h, u, min(key) AS rep FROM hsig GROUP BY h, u),
      hbands AS (
        SELECT rep, h,
          b.band, CAST((u // ([1, 65536, 4294967296, 281474976710656])[b.band + 1]) % 65536 AS BIGINT) AS bkey
        FROM hrep, (VALUES (0), (1), (2), (3)) b(band)),
      hpairs AS (
        SELECT DISTINCT a.rep AS id_a, b.rep AS id_b,
          CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
        FROM hbands a JOIN hbands b ON a.band = b.band AND a.bkey = b.bkey AND a.rep < b.rep)"""
  }

  /** CTE chain re-deriving the q46 MinHash band keys: FNV-1a shingles →
    * 64 affine permutations (limb-split HUGEINT products, signed min) →
    * rot-XOR band fold. Ends in `banded(doc_id, band, bkey)`; shared by
    * the q46 candidate oracle and the q118 end-to-end pipeline oracle. */
  private def minhashBandCtes: String = {
    val k = 64; val bands = 16; val rows = k / bands; val sh = 5
    val perms = (0 until k).map { j =>
      (j, graft.text.TextKernels.splitmix64(2 * j + 1) | 1L,
        graft.text.TextKernels.splitmix64(2 * j + 2))
    }
    val permVals = perms.map { case (j, a, b) =>
      val alo = a & 0xFFFFFFFFL; val ahi = a >>> 32
      s"($j, $alo, $ahi, CAST('${java.lang.Long.toUnsignedString(b)}' AS HUGEINT))"
    }.mkString(", ")
    val rotCase = "CASE (j % " + rows + ") " + (0 until rows).map { i =>
      val r = (13 * i) % 64
      if (r == 0) s"WHEN $i THEN u"
      else s"WHEN $i THEN ((u * ${java.math.BigInteger.ONE.shiftLeft(r)}) % $U64) + (u // ${java.math.BigInteger.ONE.shiftLeft(64 - r)})"
    }.mkString(" ") + " END"
    s"""perm(j, alo, ahi, b) AS (VALUES $permVals),
      sh5 AS (
        SELECT DISTINCT doc_id, ${fnvSql("text", "i.i", sh)} AS h
        FROM documents, LATERAL (SELECT unnest(generate_series(1, length(text) - ${sh - 1})) AS i) i),
      hsplit AS (
        SELECT doc_id, CAST(h AS HUGEINT) % 4294967296 AS hlo,
               CAST(h AS HUGEINT) // 4294967296 AS hhi FROM sh5),
      mh AS (
        SELECT doc_id, j,
          min(CAST(CASE WHEN v >= 9223372036854775808 THEN v - $U64 ELSE v END AS BIGINT)) AS sigj
        FROM (
          SELECT s.doc_id, p.j,
            (((p.alo * s.hlo + ((p.alo * s.hhi + p.ahi * s.hlo) % 4294967296) * 4294967296) % $U64) + p.b) % $U64 AS v
          FROM hsplit s, perm p)
        GROUP BY doc_id, j),
      msig AS (
        SELECT doc_id, j,
          CASE WHEN sigj < 0 THEN CAST(sigj AS HUGEINT) + $U64 ELSE CAST(sigj AS HUGEINT) END AS u
        FROM mh),
      banded AS MATERIALIZED (
        SELECT doc_id, j // $rows AS band, bit_xor(CAST(($rotCase) AS UBIGINT)) AS bkey
        FROM msig GROUP BY doc_id, band)"""
  }

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

    // BPE-ish token counting (the GPT-2 pre-tokenizer's split classes,
    // simplified to the engine-portable core): letter runs, digit runs,
    // and single non-alphanumeric marks each count one token — the
    // pre-merge unit count a BPE tokenizer starts from, and the budget
    // number a pretraining mix is planned against. Pure codegen'd regex
    // builtins (the q134 discipline: the scale path IS the builtin);
    // identical character-class semantics in Java and RE2 regex, so the
    // oracle is the same pattern verbatim.
    ("q147_bpe_tokens", (s: SparkSession, dir: String) => {
      docs(s, dir).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).as("n_bpe"),
        size(regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0))).as("n_words"),
        size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).as("n_nums"),
        size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9 ]"), lit(0))).as("n_marks"))
    }, Some("""
      SELECT doc_id,
        CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INT) AS n_bpe,
        CAST(length(regexp_extract_all(text, '[A-Za-z]+')) AS INT) AS n_words,
        CAST(length(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_nums,
        CAST(length(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS INT) AS n_marks
      FROM documents""")),

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

    // MinHash-LSH, fully oracle-backed: distinct 5-shingle FNV set →
    // 64 Broder permutations (a·h+b mod 2^64 via 32-bit-split mulmod,
    // HUGEINT-safe) → SIGNED minima (Scala Long compare) → per-band
    // rotate-xor key (bit_xor aggregate — XOR of positional rotations is
    // order-free) → bucket self-join pair counts. Assumes every doc is
    // ≥ shingle chars (corpus min length 44; the Scala kernel's short-text
    // branch is spec-covered).
    ("q46_minhash_lsh", (s: SparkSession, dir: String) => {
      Dedup.minhashCandidates(docs(s, dir), k = 64, bands = 16, shingle = 5)
    }, Some(s"""
      WITH $minhashBandCtes
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_bands
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
      GROUP BY 1, 2""")),

    // nChunks = 11 ⇒ pigeonhole guarantees recall for Hamming ≤ 10.
    // Oracle: the full simhash64 re-derivation (see simhashCtes) + the
    // chunk-bucket join and exact Hamming filter.
    ("q47_simhash_neardup", (s: SparkSession, dir: String) => {
      Dedup.simhashCandidates(docs(s, dir), maxHamming = 10, nChunks = 11)
    }, Some(s"""
      WITH RECURSIVE $simhashCtes,
      ${simhashPairCtes(11)}
      SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 10""")),

    // 4-chunk simhash here is a HEURISTIC pre-filter (recall guaranteed
    // only to Hamming ≤ 3) feeding the exact Jaccard verify. Oracle =
    // simhash candidate derivation + the q53 distinct-trigram overlap.
    ("q48_ngram_jaccard", (s: SparkSession, dir: String) => {
      val cand = Dedup.simhashCandidates(docs(s, dir), maxHamming = 16)
        .select(col("id_a"), col("id_b"))
      Dedup.jaccardVerify(cand, docs(s, dir), shingle = 3)
        .select(col("id_a"), col("id_b"), col("inter"), col("uni"))
    }, Some(s"""
      WITH RECURSIVE $simhashCtes,
      ${simhashPairCtes(4)},
      cd AS (SELECT id_a, id_b FROM cand WHERE hamming <= 16),
      tri AS MATERIALIZED (
        SELECT DISTINCT doc_id, substr(text, i, 3) AS g
        FROM documents, LATERAL (SELECT unnest(generate_series(1, length(text) - 2)) AS i)),
      sizes AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY doc_id),
      ov AS (
        SELECT p.id_a, p.id_b, count(*) AS inter
        FROM cd p JOIN tri a ON a.doc_id = p.id_a JOIN tri b ON b.doc_id = p.id_b AND a.g = b.g
        GROUP BY p.id_a, p.id_b)
      SELECT p.id_a, p.id_b,
        CAST(coalesce(o.inter, 0) AS INT) AS inter,
        CAST(sa.n + sb.n - coalesce(o.inter, 0) AS INT) AS uni
      FROM cd p
      JOIN sizes sa ON sa.doc_id = p.id_a JOIN sizes sb ON sb.doc_id = p.id_b
      LEFT JOIN ov o ON o.id_a = p.id_a AND o.id_b = p.id_b""")),

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

    // document fingerprinting + simhash, fully oracle-backed: the rolling
    // Rabin hash (base 257 mod 2^61−1) re-derives as Σ c·257^(L−i) mod p
    // over a recursive power table, and FNV-1a 64 re-derives per token via
    // a recursive CTE with HUGEINT 2^64-wraparound multiply — DuckDB's
    // checked BIGINT overflow is dodged by routing every wrap through
    // HUGEINT and casting back to UBIGINT. Bit votes avoid a 64× explode
    // by summing 64 generated CASE columns.
    ("q52_fingerprints", (s: SparkSession, dir: String) => {
      docs(s, dir).select(col("doc_id"),
        doc_fingerprint(col("text")).as("fingerprint"),
        simhash64(col("text")).as("simhash"))
    }, Some(s"""
      WITH RECURSIVE
      powers(e, pw) AS (
        SELECT 0, CAST(1 AS HUGEINT)
        UNION ALL
        SELECT e + 1, (pw * 257) % 2305843009213693951
        FROM powers WHERE e + 1 < (SELECT coalesce(max(length(text)), 1) FROM documents)),
      $simhashCtes,
      chars AS (
        SELECT doc_id, length(text) AS L, i.i, CAST(unicode(substr(text, i.i, 1)) AS HUGEINT) AS c
        FROM documents, LATERAL (SELECT unnest(generate_series(1, length(text))) AS i) i),
      fp AS (
        SELECT doc_id,
          CAST(sum((c * p.pw) % 2305843009213693951) % 2305843009213693951 AS BIGINT) AS fingerprint
        FROM chars JOIN powers p ON p.e = L - i
        GROUP BY doc_id)
      SELECT d.doc_id,
        coalesce(f.fingerprint, 0) AS fingerprint,
        CAST(CASE WHEN s.u >= 9223372036854775808 THEN CAST(s.u AS HUGEINT) - $U64
                  ELSE CAST(s.u AS HUGEINT) END AS BIGINT) AS simhash
      FROM documents d LEFT JOIN fp f ON d.doc_id = f.doc_id JOIN shu s ON d.doc_id = s.doc_id""")),

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
      tri AS MATERIALIZED (
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

    // LSH ANN, fully oracle-backed: the 16-bit Rademacher hyperplane
    // signature is an exact int64 sum (quantized components × precomputed
    // ±1 signs — the 16×64 sign table from splitmix64 is embedded as
    // VALUES rows), bands join on 4-bit slices, and the exact qdot
    // ranking reuses the q44 oracle shape.
    ("q50_ann_lsh", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      Ann.lshTopK(queries, cands, k = 5, nBits = 16, bands = 4)
    }, Some {
      val nBits = 16; val bands = 4; val rowsPerBand = nBits / bands
      val mask = (1L << rowsPerBand) - 1
      val dims = 64; val seed = 42L
      val signVals = (for {
        b <- 0 until nBits
        j <- 0 until dims
      } yield {
        val s = if ((graft.text.TextKernels.splitmix64(seed + b * 131071L + j) & 1L) == 0L) 1 else -1
        s"($b, $j, $s)"
      }).mkString(", ")
      s"""
      WITH signs(b, j, s) AS (VALUES $signVals),
      acc AS (
        SELECT e.vec_id, s.b,
          sum(CAST(floor((CAST(e.embedding[s.j + 1] AS DOUBLE) * 1048576.0) + 0.5) AS BIGINT) * s.s) AS a
        FROM embeddings e, signs s GROUP BY 1, 2),
      sig AS (
        SELECT vec_id,
          CAST(sum(CASE WHEN a >= 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS sigv
        FROM acc GROUP BY vec_id),
      bnd AS (
        SELECT vec_id, t.band, (sigv >> (t.band * $rowsPerBand)) & $mask AS bkey
        FROM sig, LATERAL (SELECT unnest(generate_series(0, ${bands - 1})) AS band) t),
      pairs AS (
        SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
        FROM bnd q JOIN bnd c ON q.band = c.band AND q.bkey = c.bkey
        WHERE q.vec_id < 10),
      scored AS (
        SELECT p.q_id, p.c_id,
          (SELECT CAST(sum(CAST(round((CAST(qe.embedding[i] AS DOUBLE) * CAST(ce.embedding[i] AS DOUBLE)) * ${Ann.Scale}) AS BIGINT)) AS BIGINT)
           FROM unnest(generate_series(1, $dims)) AS t(i)) AS score
        FROM pairs p
        JOIN embeddings qe ON qe.vec_id = p.q_id
        JOIN embeddings ce ON ce.vec_id = p.c_id)
      SELECT q_id, c_id, score, rank FROM (
        SELECT q_id, c_id, score,
               CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS INT) AS rank
        FROM scored) WHERE rank <= 5"""
    }),

    // embedding-cosine near-dup DEDUP (the 5th dedup family beside exact/
    // minhash/simhash/jaccard): rademacher-LSH band buckets → candidate
    // pairs → exact quantized-cosine verify (sqrt-free: qdot² ≥ τ²·qnA·qnB
    // over int64-exact quantities, compared in double with a fixed op
    // order). The oracle re-derives signatures, banding, candidates AND
    // the verify comparison bit-identically.
    ("q105_cosine_neardup", (s: SparkSession, dir: String) => {
      Dedup.cosineNearDup(emb(s, dir), tau = 0.35, nBits = 16, bands = 4)
    }, Some {
      val nBits = 16; val bands = 4; val rowsPerBand = nBits / bands
      val mask = (1L << rowsPerBand) - 1
      val dims = 64; val seed = 42L
      val tau2 = 0.35 * 0.35
      val signVals = (for {
        b <- 0 until nBits
        j <- 0 until dims
      } yield {
        val sg = if ((graft.text.TextKernels.splitmix64(seed + b * 131071L + j) & 1L) == 0L) 1 else -1
        s"($b, $j, $sg)"
      }).mkString(", ")
      s"""
      WITH signs(b, j, s) AS (VALUES $signVals),
      acc AS (
        SELECT e.vec_id, s.b,
          sum(CAST(floor((CAST(e.embedding[s.j + 1] AS DOUBLE) * 1048576.0) + 0.5) AS BIGINT) * s.s) AS a
        FROM embeddings e, signs s GROUP BY 1, 2),
      sig AS (
        SELECT vec_id,
          CAST(sum(CASE WHEN a >= 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS sigv
        FROM acc GROUP BY vec_id),
      bnd AS (
        SELECT vec_id, t.band, (sigv >> (t.band * $rowsPerBand)) & $mask AS bkey
        FROM sig, LATERAL (SELECT unnest(generate_series(0, ${bands - 1})) AS band) t),
      pairs AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM bnd a JOIN bnd b ON a.band = b.band AND a.bkey = b.bkey
        WHERE a.vec_id < b.vec_id),
      qn AS (
        SELECT vec_id,
          (SELECT CAST(sum(CAST(round((CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)) * ${Ann.Scale}) AS BIGINT)) AS BIGINT)
           FROM unnest(generate_series(1, $dims)) AS t(i)) AS qn
        FROM embeddings),
      scored AS (
        SELECT p.id_a, p.id_b,
          (SELECT CAST(sum(CAST(round((CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)) * ${Ann.Scale}) AS BIGINT)) AS BIGINT)
           FROM unnest(generate_series(1, $dims)) AS t(i)) AS qdot,
          qa.qn AS qn_a, qb.qn AS qn_b
        FROM pairs p
        JOIN embeddings ea ON ea.vec_id = p.id_a
        JOIN embeddings eb ON eb.vec_id = p.id_b
        JOIN qn qa ON qa.vec_id = p.id_a
        JOIN qn qb ON qb.vec_id = p.id_b)
      SELECT id_a, id_b, qdot, qn_a, qn_b FROM scored
      WHERE qdot >= 0
        AND CAST(qdot AS DOUBLE) * CAST(qdot AS DOUBLE) >=
            ($tau2 * CAST(qn_a AS DOUBLE)) * CAST(qn_b AS DOUBLE)"""
    }),

    // multimodal: opaque binary + typed metadata → decode/feature plumbing
    // (image decode is real JVM code; see q30 for stats — here: per-format
    // feature rows incl. a deterministic stub for non-image payloads)
    // IVF coarse-quantizer ANN (the second scale path beside q50's LSH):
    // map-only nearest-centroid assignment (reduced quantized L2 — the
    // ‖x‖² term cancels in the argmin, leaving exact int64 algebra),
    // nprobe-nearest-list probe, exact re-rank. Every distance and score
    // is an exact integer, and centroid components are dyadic rationals
    // exact in float AND double — the oracle re-derives assignment, probe
    // and ranking bit-identically.
    ("q99_ivf_topk", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      Ann.ivfTopK(queries, cands, graft.gen.Fixtures.centroidsFromNation(s, dir), nprobe = 3, k = 5)
    }, Some(s"""
      WITH $ivfScoredCtes
      SELECT q_id, c_id, score, rank FROM (
        SELECT q_id, c_id, score,
               CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS INT) AS rank
        FROM scored) WHERE rank <= 5""")),

    // ANN recall monitoring: recall@5 of the IVF search (q99's exact
    // configuration) against the brute-force exact top-k (q44) — the
    // eval a production pipeline runs whenever the quantizer retrains
    // or nprobe changes. All-integer: hits = |IVF∩brute| per query,
    // recall_pct = hits·20 (k=5). Scale shape: both sides reduce to
    // k rows/query BEFORE the intersection join, so the recall eval
    // costs two top-k searches + a join on 10·k rows regardless of
    // corpus size; sampling the query set is the production knob.
    ("q153_ann_recall", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      val brute = Ann.bruteTopK(queries, cands, k = 5).select(col("q_id"), col("c_id"))
      val ivf = Ann.ivfTopK(queries, cands,
        graft.gen.Fixtures.centroidsFromNation(s, dir), nprobe = 3, k = 5)
        .select(col("q_id"), col("c_id"))
      val hits = brute.join(ivf, Seq("q_id", "c_id"), "left_semi")
        .groupBy(col("q_id")).agg(count(lit(1)).as("hits"))
      queries.select(col("q_id")).join(hits, Seq("q_id"), "left")
        .select(col("q_id"), coalesce(col("hits"), lit(0L)).as("hits"),
          lit(5).as("k"), (coalesce(col("hits"), lit(0L)) * 20).cast("int").as("recall_pct"))
    }, Some(s"""
      WITH $ivfScoredCtes,
      ivf AS (
        SELECT q_id, c_id FROM (
          SELECT q_id, c_id,
                 row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rank
          FROM scored) WHERE rank <= 5),
      bscored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id,
               (SELECT CAST(sum(CAST(round((CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)) * ${Ann.Scale}) AS BIGINT)) AS BIGINT)
                FROM unnest(generate_series(1, 64)) AS t(i)) AS score
        FROM embeddings q, embeddings c
        WHERE q.vec_id < 10),
      brute AS (
        SELECT q_id, c_id FROM (
          SELECT q_id, c_id,
                 row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) AS rank
          FROM bscored) WHERE rank <= 5),
      h AS (SELECT b.q_id, count(*) AS hits
            FROM brute b JOIN ivf v ON v.q_id = b.q_id AND v.c_id = b.c_id
            GROUP BY b.q_id)
      SELECT e.vec_id AS q_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
        CAST(5 AS INT) AS k, CAST(coalesce(h.hits, 0) * 20 AS INT) AS recall_pct
      FROM embeddings e LEFT JOIN h ON h.q_id = e.vec_id
      WHERE e.vec_id < 10""")),

    // Epoch-reproducible training shuffle: per epoch a fresh
    // deterministic permutation into power-of-two shards with in-shard
    // positions — the data-order stage of a resumable training loader
    // (re-derive exactly which sample a killed job stopped at). Key =
    // splitmix64(id + epoch·golden); shard = unsigned residue (= signed
    // pmod because shards | 2^64); order = UNSIGNED hash order (Spark
    // compares the sign-flipped key; the oracle's UBIGINT orders
    // natively). One Exchange on (epoch, shard); no global sort.
    ("q154_epoch_shuffle", (s: SparkSession, dir: String) => {
      val pts = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey").as("id"))
      graft.ops.Sampling.epochShuffle(pts, "id", epochs = 2, shards = 8)
    }, Some(s"""
      WITH es AS (
        SELECT o_orderkey AS id, e FROM orders, unnest([0, 1]) AS t(e)),
      esrc AS (
        SELECT id, e, CAST(id + e * 2654435769 AS BIGINT) AS seed FROM es),
      ${smixCtes("esrc", "seed", "id, e")}
      SELECT id, CAST(e AS INT) AS epoch,
        CAST(h % 8 AS INT) AS shard,
        CAST(row_number() OVER (PARTITION BY e, h % 8 ORDER BY h, id) AS INT) AS pos
      FROM smh""")),

    // IVF-PQ approximate top-k (the IndexIVFPQ search shape): coarse
    // argmin assignment (q99's exact int64 algebra), residual product-
    // quantization into 8 sub-codes by a codegen'd per-row expression,
    // and per-query driver-built m×16 ADC lookup tables — scoring a
    // candidate is 8 int64 adds. Every constant (centroids, codebooks)
    // is a dyadic rational exact in float AND double, and every distance
    // is component-rounded int64, so the oracle re-derives assignment,
    // codes, LUTs, and ranking bit-exactly in SQL.
    ("q127_ivfpq_topk", (s: SparkSession, dir: String) => {
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      Ann.ivfPqTopK(queries, cands, graft.gen.Fixtures.centroidsFromNation(s, dir),
        graft.gen.Fixtures.pqCodebooks, nprobe = 2, k = 5)
    }, Some(s"""
      WITH qn AS (
        SELECT CAST(n_nationkey AS INT) AS cent_id,
          (SELECT CAST(sum(CAST(round((
             (CAST((n_nationkey*31 + (i-1)*17) % 64 - 32 AS DOUBLE)/32)
             * (CAST((n_nationkey*31 + (i-1)*17) % 64 - 32 AS DOUBLE)/32)) * ${Ann.Scale}) AS BIGINT)) AS BIGINT)
           FROM unnest(generate_series(1, 64)) AS t(i)) AS qnc
        FROM nation),
      dist AS (
        SELECT e.vec_id, q.cent_id,
          q.qnc - 2 * (SELECT CAST(sum(CAST(round((CAST(e.embedding[i] AS DOUBLE)
                         * (CAST((q.cent_id*31 + (i-1)*17) % 64 - 32 AS DOUBLE)/32)) * ${Ann.Scale}) AS BIGINT)) AS BIGINT)
                       FROM unnest(generate_series(1, 64)) AS t(i)) AS d
        FROM embeddings e, qn q),
      acell AS (
        SELECT vec_id AS c_id, cent_id AS cell FROM (
          SELECT vec_id, cent_id,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cent_id) AS rn
          FROM dist) WHERE rn = 1),
      qcell AS (
        SELECT vec_id AS q_id, cent_id AS cell FROM (
          SELECT vec_id, cent_id,
                 row_number() OVER (PARTITION BY vec_id ORDER BY d, cent_id) AS rn
          FROM dist WHERE vec_id < 8) WHERE rn <= 2),
      grid AS (
        SELECT s, c,
          (SELECT CAST(sum(CAST(round((
             (CAST((s*7 + c*13 + i0*5) % 32 - 16 AS DOUBLE)/64)
             * (CAST((s*7 + c*13 + i0*5) % 32 - 16 AS DOUBLE)/64)) * ${Ann.Scale}) AS BIGINT)) AS BIGINT)
           FROM unnest(generate_series(0, 7)) AS t(i0)) AS qnc
        FROM (SELECT ss.s, cc.c
              FROM (SELECT unnest(generate_series(0, 7)) AS s) ss,
                   (SELECT unnest(generate_series(0, 15)) AS c) cc)),
      encdist AS (
        SELECT a.c_id, a.cell, g.s, g.c,
          g.qnc - 2 * (SELECT CAST(sum(CAST(round((
              (CAST(e.embedding[g.s*8 + i0 + 1] AS DOUBLE)
               - (CAST((a.cell*31 + (g.s*8 + i0)*17) % 64 - 32 AS DOUBLE)/32))
              * (CAST((g.s*7 + g.c*13 + i0*5) % 32 - 16 AS DOUBLE)/64)) * ${Ann.Scale}) AS BIGINT)) AS BIGINT)
                      FROM unnest(generate_series(0, 7)) AS t(i0)) AS d
        FROM acell a JOIN embeddings e ON e.vec_id = a.c_id, grid g),
      codes AS (
        SELECT c_id, cell, s, c AS code FROM (
          SELECT c_id, cell, s, c,
                 row_number() OVER (PARTITION BY c_id, s ORDER BY d, c) AS rn
          FROM encdist) WHERE rn = 1),
      lut AS (
        SELECT qc.q_id, qc.cell, g.s, g.c,
          (SELECT CAST(sum(CAST(round((
              ((CAST(q.embedding[g.s*8 + i0 + 1] AS DOUBLE)
                - (CAST((qc.cell*31 + (g.s*8 + i0)*17) % 64 - 32 AS DOUBLE)/32))
               - (CAST((g.s*7 + g.c*13 + i0*5) % 32 - 16 AS DOUBLE)/64))
              * ((CAST(q.embedding[g.s*8 + i0 + 1] AS DOUBLE)
                - (CAST((qc.cell*31 + (g.s*8 + i0)*17) % 64 - 32 AS DOUBLE)/32))
               - (CAST((g.s*7 + g.c*13 + i0*5) % 32 - 16 AS DOUBLE)/64))) * ${Ann.Scale}) AS BIGINT)) AS BIGINT)
           FROM unnest(generate_series(0, 7)) AS t(i0)) AS v
        FROM qcell qc JOIN embeddings q ON q.vec_id = qc.q_id, grid g),
      adcs AS (
        SELECT qc.q_id, a.c_id, CAST(sum(l.v) AS BIGINT) AS adc
        FROM qcell qc
        JOIN acell a ON a.cell = qc.cell
        JOIN codes cd ON cd.c_id = a.c_id AND cd.cell = a.cell
        JOIN lut l ON l.q_id = qc.q_id AND l.cell = qc.cell
                  AND l.s = cd.s AND l.c = cd.code
        GROUP BY qc.q_id, a.c_id)
      SELECT q_id, c_id, adc, rank FROM (
        SELECT q_id, c_id, adc,
               CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc, c_id) AS INT) AS rank
        FROM adcs) WHERE rank <= 5""")),

    // Corpus-wide duplicated-span removal (C4-style, segment granularity):
    // 10-word windows, global first occurrence kept. Pure integer counts
    // per doc; the oracle replays segmentation (1-based inclusive list
    // slices ≡ Spark's slice(arr, start, len)) and the first-occurrence
    // window in SQL.
    ("q129_segment_dedup", (s: SparkSession, dir: String) => {
      Dedup.segmentDedup(s.read.parquet(s"$dir/documents.parquet"), w = 10)
        .withColumn("dropped_segs", col("total_segs") - col("kept_segs"))
    }, Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents WHERE len(text) > 0),
      segs AS (
        SELECT doc_id, i AS seg_no,
               array_to_string(ws[i*10 + 1 : i*10 + 10], ' ') AS seg
        FROM d, unnest(generate_series(0, CAST(ceil(len(ws) / 10.0) AS INT) - 1)) AS t(i)),
      k AS (
        SELECT doc_id, seg_no,
               row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_no) AS rn
        FROM segs)
      SELECT doc_id,
        CAST(count(*) AS INT) AS total_segs,
        CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT) AS kept_segs,
        CAST(count(*) - sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT) AS dropped_segs
      FROM k GROUP BY doc_id""")),

    // k-means coarse-quantizer TRAINING (distributed Lloyd's) — q99/q127
    // take their IVF centroid sets as input; this is where they come
    // from. Per round: one codegen'd argmin map (centroids broadcast in
    // the expression) + one hash-agg of k×(d+2) longs with map-side
    // combine. The whole trajectory is exact int64 (component
    // quantization, reduced-L2 argmin, floorDiv update), so the oracle
    // re-derives BOTH Lloyd's rounds — every assignment, every updated
    // centroid — and the final per-cluster (n, qx_sum, score, qc_sum)
    // bit-for-bit. (The SQL floor(s/n) double division is exact while
    // |s| < 2^52 and |s/n| has ≥1/n slack to integers — holds at any
    // test SF; the ENGINE uses Math.floorDiv, exact at any scale.)
    ("q130_kmeans", (s: SparkSession, dir: String) => {
      Kmeans.fit(emb(s, dir).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", k = 4, iters = 2).summary
    }, Some(s"""
      WITH $kmeansTrajectoryCtes,
      pv AS (SELECT vec_id, CAST(sum(q) AS BIGINT) AS qs FROM px GROUP BY vec_id),
      cs AS (SELECT j, CAST(sum(q) AS BIGINT) AS qcs FROM c2 GROUP BY j)
      SELECT a.cell,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pv.qs) AS BIGINT) AS qx_sum,
             CAST(sum(a.d) AS BIGINT) AS score,
             CAST(min(cs.qcs) AS BIGINT) AS qc_sum
      FROM a2 a JOIN pv ON pv.vec_id = a.vec_id JOIN cs ON cs.j = a.cell
      GROUP BY a.cell""")),

    // SemDeDup (Abbas et al. 2023): k-means-clustered embedding dedup —
    // candidates only within a coarse cluster, exact quantized-cosine
    // verify (the q105 accept rule), min-id representative kept. The
    // oracle replays the FULL chain exactly: both Lloyd's training rounds
    // (the q130 trajectory CTEs), the final-model assignment, the
    // within-cluster pair set, the int64 qdot/qnorm verify with the fixed
    // double comparison order, and the drop rule.
    ("q131_semdedup", (s: SparkSession, dir: String) => {
      Dedup.semDedup(emb(s, dir), k = 4, iters = 2, tau = 0.35)
    }, Some {
      val tau2 = 0.35 * 0.35
      s"""
      WITH $kmeansTrajectoryCtes,
      d3 AS (
        SELECT p.vec_id, c.j,
               CAST(sum(c.q * c.q) - 2 * sum(p.q * c.q) AS BIGINT) AS d
        FROM px p JOIN c2 c ON c.i = p.i GROUP BY p.vec_id, c.j),
      a3 AS (SELECT vec_id, j AS cell FROM (
               SELECT vec_id, j,
                      row_number() OVER (PARTITION BY vec_id ORDER BY d, j) AS rn
               FROM d3) WHERE rn = 1),
      qn AS (
        SELECT vec_id,
          (SELECT CAST(sum(CAST(round((CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)) * ${Ann.Scale}) AS BIGINT)) AS BIGINT)
           FROM unnest(generate_series(1, 64)) AS t(i)) AS qn
        FROM embeddings),
      pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM a3 a JOIN a3 b ON a.cell = b.cell AND a.vec_id < b.vec_id),
      scored AS (
        SELECT p.id_a, p.id_b,
          (SELECT CAST(sum(CAST(round((CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)) * ${Ann.Scale}) AS BIGINT)) AS BIGINT)
           FROM unnest(generate_series(1, 64)) AS t(i)) AS qdot,
          qa.qn AS qn_a, qb.qn AS qn_b
        FROM pairs p
        JOIN embeddings ea ON ea.vec_id = p.id_a
        JOIN embeddings eb ON eb.vec_id = p.id_b
        JOIN qn qa ON qa.vec_id = p.id_a
        JOIN qn qb ON qb.vec_id = p.id_b),
      drp AS (
        SELECT DISTINCT id_b FROM scored
        WHERE qdot >= 0
          AND CAST(qdot AS DOUBLE) * CAST(qdot AS DOUBLE) >=
              ($tau2 * CAST(qn_a AS DOUBLE)) * CAST(qn_b AS DOUBLE))
      SELECT a.vec_id, CAST(a.cell AS INT) AS cell,
             (d.id_b IS NOT NULL) AS dropped
      FROM a3 a LEFT JOIN drp d ON d.id_b = a.vec_id"""
    }),

    ("q51_multimodal_features", (s: SparkSession, dir: String) => {
      graft.gen.Fixtures.imagesFromParts(s, dir)
        .filter(col("key") % 5 === 0)
        .withColumn("p", graft.expr.functions.image_profile(col("bytes"), col("fmt"), col("w"), col("h")))
        .select(col("image_id"), col("fmt"),
          length(col("bytes")).as("payload_bytes"),
          col("p.mean").as("mean_px"),
          col("p.phash").as("phash"))
    }, None),

    // Image near-dup join on the corpus phash column (the north-star
    // input table carries phash:int64 per image — BASELINE.json
    // input_hint): exact dedup FIRST (groupBy phash, min-key
    // representative — the Dedup class-doc discipline: pair enumeration
    // over a mass-duplicate corpus is quadratic, over its distinct hashes
    // it is bounded by hash-space diversity), then the 4×16-bit
    // multi-index Hamming join over representatives — PERFECT recall for
    // distance ≤ 3 by pigeonhole, exact bit_count(xor) verify. Oracle
    // re-derives every phash from the pixel pattern in exact integer SQL
    // (the lcm-cleared mean test matches phashOfRaster bit-for-bit).
    ("q113_phash_neardup", (s: SparkSession, dir: String) => {
      val reps = graft.gen.Fixtures.imagesFromParts(s, dir)
        .groupBy(col("phash")).agg(min(col("key")).as("rep"))
      Dedup.hammingNearDup(reps, "phash", "rep", maxHamming = 3, nChunks = 4)
    }, Some(s"""
      WITH $phashPairCtes
      SELECT id_a, id_b, hamming FROM hpairs WHERE hamming <= 3""")),

    // Duplicate-cluster assignment: connected components (alternating
    // large-star/small-star) over the representative near-dup graph,
    // expanded back to every image through its phash representative —
    // every image maps to the minimum key reachable through the
    // Hamming-≤3 graph, singletons to themselves. The ORACLE re-derives
    // every phash from pixels, the pigeonhole band pairs, and the
    // components by recursive min-label reach (a different algorithm from
    // the engine's star rounds) — over the REPRESENTATIVE graph, expanded
    // through each image's hash rep. (It previously propagated over the
    // full per-image pair graph, but the reach relation is quadratic in
    // duplicate-cluster size — 303k label rows / ~3 min in DuckDB at
    // sf0.01, the likely cause of the round-4 driver compare arriving
    // empty. The full-graph ≡ rep-graph factorization the full reach used
    // to confirm is now pinned by a brute-force union-find spec in
    // ComponentsSpec instead.)
    ("q114_phash_clusters", (s: SparkSession, dir: String) => {
      val imgs = graft.gen.Fixtures.imagesFromParts(s, dir)
      // persisted: the rep-map groupBy feeds the pair build, the
      // components node frame AND the expansion join — one corpus
      // Exchange instead of three
      val repMap = graft.pipeline.Caches.persist(
        imgs.groupBy(col("phash")).agg(min(col("key")).as("rep")))
      val pairs = Dedup.hammingNearDup(repMap, "phash", "rep", maxHamming = 3, nChunks = 4)
      val comp = graft.ops.Components.connectedComponents(
        pairs, "id_a", "id_b", repMap.select(col("rep").as("id")))
      imgs.select(col("key"), col("phash"))
        .join(repMap, Seq("phash"))
        .join(comp, col("rep") === col("id"))
        .select(col("key").as("id"), col("component"))
    }, Some(s"""
      WITH RECURSIVE $phashPairCtes,
      hedges AS MATERIALIZED (
        SELECT id_a AS a, id_b AS b FROM hpairs WHERE hamming <= 3
        UNION ALL
        SELECT id_b AS a, id_a AS b FROM hpairs WHERE hamming <= 3),
      reach(id, lbl) AS (
        SELECT rep, rep FROM hrep
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN hedges e ON e.a = r.id WHERE r.lbl < e.b),
      rcomp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id)
      SELECT s.key AS id, c.component
      FROM hsig s JOIN hrep r ON r.h = s.h JOIN rcomp c ON c.id = r.rep""")),

    // Leakage-safe train/val split: the q114 duplicate clusters feed
    // Sampling.leakageSplit — split assignment hashes the COMPONENT
    // label, so every near-dup cluster lands whole on one side of the
    // cut and no Hamming-linked pair can straddle it. The query emits
    // the per-split census PLUS the cross-split leak count computed
    // in-plan over the rep near-dup pairs (structurally 0; the oracle
    // re-derives components by recursive min-label reach and confirms
    // the same invariant independently). Scale shape: the split is a
    // codegen'd map over (id, component); the census is one two-phase
    // hash-agg; the leak check joins the SMALL rep-pair frame twice
    // against the persisted split frame.
    ("q152_leakage_split", (s: SparkSession, dir: String) => {
      val imgs = graft.gen.Fixtures.imagesFromParts(s, dir)
      // persisted: rep-map feeds the pair build, the components node
      // frame and the assign join — one corpus Exchange instead of three
      val repMap = graft.pipeline.Caches.persist(
        imgs.groupBy(col("phash")).agg(min(col("key")).as("rep")))
      // persisted: consumed by BOTH the components build (which eagerly
      // checkpoints its own edge copy) and the leak-count join — without
      // the persist the banded self-join runs twice
      val pairs = graft.pipeline.Caches.persist(
        Dedup.hammingNearDup(repMap, "phash", "rep", maxHamming = 3, nChunks = 4))
      val comp = graft.ops.Components.connectedComponents(
        pairs, "id_a", "id_b", repMap.select(col("rep").as("id")))
      val assign = imgs.select(col("key"), col("phash"))
        .join(repMap, Seq("phash"))
        .join(comp, col("rep") === col("id"))
        .select(col("key").as("id"), col("component"))
      val split = graft.pipeline.Caches.persist(
        graft.ops.Sampling.leakageSplit(assign, valPermille = 100L, salt = 17L))
      val leaks = split.select(col("id").as("la"), col("split").as("sa"))
        .join(pairs.select(col("id_a"), col("id_b")), col("la") === col("id_a"))
        .join(split.select(col("id").as("lb"), col("split").as("sb")), col("lb") === col("id_b"))
        .filter(col("sa") =!= col("sb"))
        .agg(count(lit(1)).as("leaked_pairs"))
      split.groupBy(col("split"))
        .agg(count(lit(1)).as("n_ids"), countDistinct(col("component")).as("n_components"))
        .crossJoin(broadcast(leaks))
        .select(col("split"), col("n_ids"), col("n_components"), col("leaked_pairs"))
    }, Some(s"""
      WITH RECURSIVE $phashPairCtes,
      hedges AS MATERIALIZED (
        SELECT id_a AS a, id_b AS b FROM hpairs WHERE hamming <= 3
        UNION ALL
        SELECT id_b AS a, id_a AS b FROM hpairs WHERE hamming <= 3),
      reach(id, lbl) AS (
        SELECT rep, rep FROM hrep
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN hedges e ON e.a = r.id WHERE r.lbl < e.b),
      rcomp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
      compo AS (
        SELECT s.key AS id, c.component
        FROM hsig s JOIN hrep r ON r.h = s.h JOIN rcomp c ON c.id = r.rep),
      sp AS (SELECT id, component,
               CASE WHEN ((component * 1000003 + 17) % 1000) < 100
                    THEN 'val' ELSE 'train' END AS split
             FROM compo),
      leaks AS (SELECT count(*) AS lk
                FROM (SELECT id_a, id_b FROM hpairs WHERE hamming <= 3) p
                JOIN sp a ON a.id = p.id_a JOIN sp b ON b.id = p.id_b
                WHERE a.split <> b.split)
      SELECT split, CAST(count(*) AS BIGINT) AS n_ids,
        CAST(count(DISTINCT component) AS BIGINT) AS n_components,
        (SELECT CAST(lk AS BIGINT) FROM leaks) AS leaked_pairs
      FROM sp GROUP BY split""")),

    // BM25 top-k retrieval (exact-rational idf flavor — see Relevance):
    // per-doc tf/dl are codegen'd projections, corpus stats one broadcast
    // aggregate row, top-k a TakeOrdered. The oracle mirrors every double
    // op: one division per factor, left-to-right term summation.
    ("q115_bm25_topk", (s: SparkSession, dir: String) => {
      graft.text.Relevance.bm25TopK(docs(s, dir), Bm25Terms, k = 50, logIdf = false)
    }, Some(bm25OracleSql)),

    // DSIR importance resampling: raw-pool docs scored by hashed-unigram
    // (fnv-1a & 255) target-vs-pool resemblance, target = source 'src0'.
    // The per-token log-ratio is the integer LLR surrogate tc·R − rc·T —
    // same sign/ordering direction, exact int64 end-to-end (see
    // Relevance.dsirTopK). Oracle replays the fnv token hashing (the q47
    // recursive chain), the 256-bucket counts, and the surrogate sum.
    ("q139_dsir_topk", (s: SparkSession, dir: String) => {
      graft.text.Relevance.dsirTopK(docs(s, dir), col("source") === "src0", k = 50)
    }, Some(s"""
      WITH RECURSIVE $simhashCtes,
      b AS (SELECT doc_id, CAST((h % 256) AS BIGINT) AS hb FROM tokh),
      flag AS (SELECT doc_id, (source = 'src0') AS tgt FROM documents),
      cnt AS (SELECT hb,
               sum(CASE WHEN f.tgt THEN 1 ELSE 0 END) AS tc,
               sum(CASE WHEN NOT f.tgt THEN 1 ELSE 0 END) AS rc
              FROM b JOIN flag f ON f.doc_id = b.doc_id GROUP BY hb),
      tot AS (SELECT sum(tc) AS t, sum(rc) AS r FROM cnt),
      sc AS (SELECT b.doc_id,
               CAST(sum(c.tc * (SELECT r FROM tot) - c.rc * (SELECT t FROM tot)) AS BIGINT) AS score,
               CAST(count(*) AS BIGINT) AS n_toks
             FROM b JOIN cnt c ON c.hb = b.hb JOIN flag f ON f.doc_id = b.doc_id
             WHERE NOT f.tgt GROUP BY b.doc_id)
      SELECT doc_id, score, n_toks FROM sc ORDER BY score DESC, doc_id LIMIT 50""")),

    // Caption↔embedding alignment (the CLIP-score-style multimodal
    // filter): each document's hashed bag-of-words vector (hashing trick,
    // 64 buckets = the embedding dimension) scores by exact int64 dot
    // against its row's quantized embedding, and the 50 LEAST-aligned
    // pairs — what a curation pass would drop or re-caption — are
    // emitted. The plumbing is the production shape (per-row hash-embed
    // map, id equi-join that shuffles both corpus-sized sides at scale,
    // TakeOrdered top-k with per-partition heaps); the fixture
    // embeddings are synthetic so the score's MEANING is synthetic too,
    // but every number is exact: the oracle re-derives tokenization,
    // fnv-1a bucketing, quantization, and the dot in SQL.
    ("q146_caption_align", (s: SparkSession, dir: String) => {
      val d = docs(s, dir).select(col("doc_id"),
        graft.text.textfunctions.hash_embed(col("text"), 64).as("hv"))
      val e = emb(s, dir).select(col("vec_id"),
        graft.expr.functions.quantize_emb(col("embedding")).as("qx"))
      d.join(e, col("doc_id") === col("vec_id"))
        .select(col("doc_id"),
          graft.expr.functions.int_dot(col("hv"), col("qx")).as("score"),
          expr("aggregate(hv, CAST(0 AS BIGINT), (a, x) -> a + x)").as("n_toks"))
        .orderBy(col("score"), col("doc_id")).limit(50)
    }, Some(s"""
      WITH RECURSIVE $simhashCtes,
      bc AS (SELECT doc_id, CAST((h % 64) AS BIGINT) AS hb, count(*) AS c
             FROM tokh GROUP BY doc_id, hb),
      sc AS (SELECT b.doc_id,
               CAST(sum(b.c * CAST(round(CAST(e.embedding[CAST(b.hb AS INT) + 1] AS DOUBLE) * ${Ann.Scale}) AS BIGINT)) AS BIGINT) AS score,
               CAST(sum(b.c) AS BIGINT) AS n_toks
             FROM bc b JOIN embeddings e ON e.vec_id = b.doc_id
             GROUP BY b.doc_id)
      SELECT doc_id, score, n_toks FROM sc ORDER BY score, doc_id LIMIT 50""")),

    // Embedding label-outlier pruning (the mislabeled/noise-sample filter
    // of an embedding-curated corpus): each vector scores by its exact
    // int64 alignment with its label's quantized component-sum vector
    // (the unnormalized centroid — same argsort as mean-centroid dot),
    // and the bottom-5 per label are flagged. One persisted quantized
    // frame feeds the per-label vec_sum (two-phase agg to |labels| rows,
    // broadcast back) and the codegen'd int_dot scoring map; the only
    // corpus-wide wide op is the per-label rank window. Oracle re-derives
    // quantization, sums, and dots in exact int64 SQL.
    ("q141_label_outliers", (s: SparkSession, dir: String) => {
      val e = graft.pipeline.Caches.persist(
        emb(s, dir).select(col("vec_id"), col("label"),
          graft.expr.functions.quantize_emb(col("embedding")).as("qx")))
      val sums = e.groupBy("label")
        .agg(graft.expr.functions.vec_sum(col("qx")).as("sv"), count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("label").orderBy(col("score"), col("vec_id"))
      e.join(broadcast(sums), "label")
        .withColumn("score", graft.expr.functions.int_dot(col("qx"), col("sv")))
        .withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 5)
        .select(col("label"), col("vec_id"), col("score"), col("rank"), col("n"))
    }, Some(s"""
      WITH px AS (
        SELECT vec_id, i,
               CAST(round(CAST(embedding[i] AS DOUBLE) * ${Ann.Scale}) AS BIGINT) AS q
        FROM embeddings, unnest(generate_series(1, 64)) AS t(i)),
      lv AS (SELECT vec_id, label FROM embeddings),
      sv AS (SELECT l.label, p.i, CAST(sum(p.q) AS BIGINT) AS s
             FROM px p JOIN lv l ON l.vec_id = p.vec_id GROUP BY l.label, p.i),
      nn AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
      sc AS (SELECT l.vec_id, l.label, CAST(sum(p.q * s.s) AS BIGINT) AS score
             FROM px p JOIN lv l ON l.vec_id = p.vec_id
               JOIN sv s ON s.label = l.label AND s.i = p.i
             GROUP BY l.vec_id, l.label)
      SELECT x.label, x.vec_id, x.score, CAST(x.rank AS INT) AS rank, nn.n
      FROM (SELECT label, vec_id, score,
              row_number() OVER (PARTITION BY label ORDER BY score, vec_id) AS rank
            FROM sc) x JOIN nn ON nn.label = x.label
      WHERE x.rank <= 5""")),

    // Deterministic stratified sampling (the training-mix recipe: keep a
    // per-language ppm fraction, selected by the splitmix64 bucket of the
    // doc id — reproducible across retries/repartitioning, unlike
    // RNG-seeded sample()). Oracle re-derives splitmix64 with limb-split
    // HUGEINT multiplications.
    ("q116_stratified_sample", (s: SparkSession, dir: String) => {
      graft.ops.Sampling.stratifiedSample(
        docs(s, dir).select(col("doc_id"), col("lang")), "doc_id", "lang", SampleRates)
    }, Some(s"""
      WITH $sampleBucketCtes
      SELECT * FROM (
        SELECT doc_id, lang, bucket, ${sampleRateCaseSql} AS rate_ppm FROM smb)
      WHERE bucket < rate_ppm""")),

    // Exact-k-per-stratum variant: deterministically the min(k, |stratum|)
    // docs with the smallest sampling buckets per language.
    ("q117_stratified_topk", (s: SparkSession, dir: String) => {
      graft.ops.Sampling.stratifiedTopK(
        docs(s, dir).select(col("doc_id"), col("lang")), "doc_id", "lang", k = 20)
    }, Some(s"""
      WITH $sampleBucketCtes
      SELECT * FROM (
        SELECT doc_id, lang, bucket,
          CAST(row_number() OVER (PARTITION BY lang ORDER BY bucket, doc_id) AS INT) AS rk
        FROM smb)
      WHERE rk <= 20""")),

    // PII detection + masking (the C4/Dolma scrubbing pass): email, IPv4
    // and US-phone patterns counted and replaced with type tokens. Pure
    // codegen'd regex builtins — at 100 TB this is a map-only pass, no
    // UDF, no shuffle. The fixture text carries no PII, so the query
    // injects it deterministically first (left-to-right replaces,
    // identical in DuckDB); patterns are anchored/char-class-only so
    // java.util.regex and RE2 agree on every match boundary.
    ("q134_pii_mask", (s: SparkSession, dir: String) => {
      val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ipPat = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
      val phonePat = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
      val injected = replace(replace(replace(col("text"),
          lit(" row "), lit(" alice.smith@example.com ")),
          lit(" scan "), lit(" 10.0.42.7 ")),
          lit(" sort "), lit(" 555-867-5309 "))
      docs(s, dir).select(col("doc_id"), injected.as("t"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(emailPat), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("t"), lit(ipPat), lit(0))).as("n_ips"),
          size(regexp_extract_all(col("t"), lit(phonePat), lit(0))).as("n_phones"),
          regexp_replace(regexp_replace(regexp_replace(col("t"),
            lit(emailPat), lit("[EMAIL]")),
            lit(ipPat), lit("[IP]")),
            lit(phonePat), lit("[PHONE]")).as("masked"))
    }, Some("""
      WITH s AS (
        SELECT doc_id,
               replace(replace(replace(text,
                 ' row ', ' alice.smith@example.com '),
                 ' scan ', ' 10.0.42.7 '),
                 ' sort ', ' 555-867-5309 ') AS t
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
             CAST(len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INT) AS n_ips,
             CAST(len(regexp_extract_all(t, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS INT) AS n_phones,
             regexp_replace(regexp_replace(regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g'),
               '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '[PHONE]', 'g') AS masked
      FROM s""")),

    // Temperature-reweighted mixture sampling (α = 1/2 data mixing):
    // per-language quotas ∝ sqrt(n_lang), derived entirely in exact int64
    // after a correctly-rounded sqrt (floor(sqrt·2^20), order-free integer
    // sum, integer division), rows picked in deterministic hash order.
    ("q133_temperature_mix", (s: SparkSession, dir: String) => {
      graft.ops.Sampling.temperatureMix(
        docs(s, dir).select(col("doc_id"), col("lang")), "doc_id", "lang", total = 200L)
    }, Some(s"""
      WITH $sampleBucketCtes,
      cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
      sq AS (SELECT lang, n_docs,
                    CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1048576) AS BIGINT) AS s_q
             FROM cnt),
      q AS (SELECT lang, CAST((200 * s_q) // (SELECT sum(s_q) FROM sq) AS BIGINT) AS quota
            FROM sq)
      SELECT * FROM (
        SELECT m.doc_id, m.lang, m.bucket, q.quota,
               CAST(row_number() OVER (PARTITION BY m.lang ORDER BY m.bucket, m.doc_id) AS INT) AS rk
        FROM smb m JOIN q ON q.lang = m.lang)
      WHERE rk <= quota""")),

    // Aspect-ratio bucketing + batch packing (the SDXL/NovelAI bucketed-
    // batching recipe): nearest aspect bucket by division-free integer
    // argmin (common-denominator scores, ties → lowest index), then
    // fixed-size batches per bucket in deterministic hash order with the
    // incomplete tail dropped. Metadata-only — no image ever decodes.
    // The fixture corpus is square, so varied dims derive from the key.
    // WebDataset-style shard packing (ops/Sharding.scala): cut the corpus
    // in deterministic id order into ~256 KiB shards via the two-phase
    // distributed prefix sum — per-bucket byte subtotals broadcast back
    // as exclusive offsets + a per-bucket running-sum window (the corpus
    // never passes through a single-task global window). The oracle IS
    // the naive global formulation: one window cumsum over the same
    // order, shard = exclusive-prefix div target — exact int64 algebra,
    // so the two-phase plan must reproduce it row-for-row.
    ("q144_shard_pack", (s: SparkSession, dir: String) => {
      val src = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey").as("id"),
          ((col("o_orderkey") * 31) % 997 + 100).cast("long").as("nbytes"))
      graft.ops.Sharding.packShards(src, "id", "nbytes",
        targetBytes = 262144L, bucket = expr("id div 4096"))
        .select(col("id"), col("nbytes"), col("cum_before"), col("shard_id"))
    }, Some("""
      SELECT id, nbytes,
        CAST(cum - nbytes AS BIGINT) AS cum_before,
        CAST((cum - nbytes) // 262144 AS BIGINT) AS shard_id
      FROM (
        SELECT id, nbytes, sum(nbytes) OVER (ORDER BY id) AS cum
        FROM (SELECT o_orderkey AS id,
                     CAST((o_orderkey * 31) % 997 + 100 AS BIGINT) AS nbytes
              FROM orders))""")),

    // Concat-and-chunk sequence packing (GPT-pretraining layout): REAL
    // whitespace token counts over documents, concatenated in doc_id
    // order, cut every 2048 tokens; each doc reports its bin span. Engine
    // path = the q144 two-phase distributed prefix scan (per-bucket
    // subtotals → driver prefix → per-bucket window) — the oracle's
    // global-order cumsum window is exactly what the engine must NOT run
    // at 100 TB.
    ("q156_sequence_pack", (s: SparkSession, dir: String) => {
      val d = docs(s, dir).select(col("doc_id"),
        size(filter(split(col("text"), "\\s+"), x => length(x) > 0))
          .cast("long").as("n_tokens"))
      graft.ops.Sharding.packSequences(d, "doc_id", "n_tokens", capacity = 2048L,
        bucket = expr("doc_id div 256"))
        .select(col("doc_id"), col("n_tokens"), col("tok_offset"), col("start_bin"),
          col("end_bin"), col("bins_spanned"), col("start_off_in_bin"))
    }, Some("""
      WITH t AS (
        SELECT doc_id,
          CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, n_tokens,
          sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens AS off
        FROM t WHERE n_tokens > 0)
      SELECT doc_id, n_tokens,
        CAST(off AS BIGINT) AS tok_offset,
        CAST(off // 2048 AS BIGINT) AS start_bin,
        CAST((off + n_tokens - 1) // 2048 AS BIGINT) AS end_bin,
        CAST((off + n_tokens - 1) // 2048 - off // 2048 + 1 AS INT) AS bins_spanned,
        CAST(off % 2048 AS INT) AS start_off_in_bin
      FROM c""")),

    ("q136_aspect_batches", (s: SparkSession, dir: String) => {
      val m = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey").as("key"),
          (lit(64) + (col("p_partkey") * 13) % 193).cast("int").as("w_ar"),
          (lit(64) + (col("p_partkey") * 29) % 157).cast("int").as("h_ar"))
      graft.ops.Batching.packBatches(m, "key", "w_ar", "h_ar", batchSize = 8)
    }, Some(s"""
      WITH pm AS (
        SELECT p_partkey AS key,
               CAST(64 + (p_partkey * 13) % 193 AS INT) AS w_ar,
               CAST(64 + (p_partkey * 29) % 157 AS INT) AS h_ar
        FROM part),
      ${smixCtes("pm", "key", "w_ar, h_ar")},
      sc AS (
        SELECT key, w_ar, h_ar, bucket AS sb,
               abs(w_ar - h_ar) * 144 AS s0,
               abs(w_ar * 3 - h_ar * 4) * 48 AS s1,
               abs(w_ar * 4 - h_ar * 3) * 36 AS s2,
               abs(w_ar * 9 - h_ar * 16) * 16 AS s3,
               abs(w_ar * 16 - h_ar * 9) * 9 AS s4
        FROM smb),
      ab AS (
        SELECT key, w_ar, h_ar, sb,
               CAST(CASE WHEN s0 = m THEN 0 WHEN s1 = m THEN 1 WHEN s2 = m THEN 2
                         WHEN s3 = m THEN 3 ELSE 4 END AS INT) AS bucket
        FROM (SELECT *, least(s0, s1, s2, s3, s4) AS m FROM sc)),
      rked AS (
        SELECT key, w_ar, h_ar, bucket,
               CAST(row_number() OVER (PARTITION BY bucket ORDER BY sb, key) AS INT) AS rk,
               count(*) OVER (PARTITION BY bucket) AS n
        FROM ab)
      SELECT key, w_ar, h_ar, bucket, rk,
             CAST((rk - 1) // 8 AS INT) AS batch_id
      FROM rked WHERE rk <= (n // 8) * 8""")),

    // The END-TO-END curation flow as one declarative plan — what a real
    // 100 TB dedup run actually executes: MinHash-LSH candidates (q46) →
    // exact n-gram Jaccard verify ≥ 0.5 (q48/q53) → connected components
    // over the verified near-dup graph (q114's engine) → per-doc
    // canonical assignment (`keep` = is the cluster minimum). The oracle
    // composes the SAME three re-derivations and closes the graph with
    // recursive min-label propagation — every stage boundary is checked
    // by its own query, this checks their COMPOSITION.
    ("q118_dedup_pipeline", (s: SparkSession, dir: String) => {
      // ONE corpus scan, ONE per-doc text walk stage: a single projection
      // computes the minhash signature AND the verify shingle set, and
      // only the hashes are persisted — the corpus TEXT is read from
      // parquet once and never cached (at 100 TB the text column is the
      // dataset; sig + sh are a fraction of it). The fused frame feeds
      // the banding leg, the verify attach sides, and the components
      // node frame.
      val fused = graft.pipeline.Caches.persist(
        graft.pipeline.Spread.toCores(docs(s, dir)).select(col("doc_id"),
          minhash_sig(col("text"), 64, 5).as("sig"),
          char_shingles(col("text"), 3).as("sh")))
      val cand = graft.pipeline.Caches.persist(
        Dedup.minhashCandidatesFromSigs(
            fused.select(col("doc_id").as("id"), col("sig")), k = 64, bands = 16)
          .select(col("id_a"), col("id_b")))
      val verified = Dedup.jaccardVerifyHashed(cand, fused.select(col("doc_id"), col("sh")),
          minJaccard = 0.5)
        .select(col("id_a"), col("id_b"))
      val comp = graft.ops.Components.connectedComponents(
        verified, "id_a", "id_b", fused.select(col("doc_id").as("id")), "id")
      comp.select(col("id").as("doc_id"), col("component").as("canonical"),
        (col("id") === col("component")).as("keep"))
    }, Some(s"""
      WITH RECURSIVE $minhashBandCtes,
      mcand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
      tri AS MATERIALIZED (
        SELECT DISTINCT doc_id, substr(text, i, 3) AS g
        FROM documents, LATERAL (SELECT unnest(generate_series(1, length(text) - 2)) AS i)),
      sizes AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY doc_id),
      ov AS (
        SELECT p.id_a, p.id_b, count(*) AS inter
        FROM mcand p JOIN tri a ON a.doc_id = p.id_a
                     JOIN tri b ON b.doc_id = p.id_b AND a.g = b.g
        GROUP BY p.id_a, p.id_b),
      ver AS MATERIALIZED (
        SELECT p.id_a, p.id_b FROM mcand p
        JOIN sizes sa ON sa.doc_id = p.id_a JOIN sizes sb ON sb.doc_id = p.id_b
        LEFT JOIN ov o ON o.id_a = p.id_a AND o.id_b = p.id_b
        WHERE CAST(coalesce(o.inter, 0) AS DOUBLE)
              / CAST(sa.n + sb.n - coalesce(o.inter, 0) AS DOUBLE) >= 0.5),
      dedges AS MATERIALIZED (
        SELECT id_a AS a, id_b AS b FROM ver
        UNION ALL
        SELECT id_b AS a, id_a AS b FROM ver),
      reach(id, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN dedges e ON e.a = r.id WHERE r.lbl < e.b)
      SELECT id AS doc_id, min(lbl) AS canonical, (id = min(lbl)) AS keep
      FROM reach GROUP BY id""")),

    // Benchmark decontamination: word-3-gram overlap of the corpus
    // (doc_id % 20 <> 0) against a held-out eval set (doc_id % 20 = 0).
    // Engine path: driver-collected distinct bench gram hashes broadcast
    // into a codegen'd per-row binary-search probe — the corpus is never
    // shuffled or joined. Oracle re-derives the same distinct word-3-gram
    // sets as strings (hash vs string equality coincide absent 64-bit FNV
    // collisions, as in q48/q53).
    ("q119_decontaminate", (s: SparkSession, dir: String) => {
      val d = docs(s, dir)
      graft.ops.Decontaminate.flag(
        d.filter(col("doc_id") % 20 =!= 0),
        d.filter(col("doc_id") % 20 === 0), n = 3)
    }, Some("""
      WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
        FROM documents),
      g0 AS (
        SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
        FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(1, len(ws) - 2))) AS i)),
      dg AS (SELECT DISTINCT doc_id, gram FROM g0),
      bench AS (SELECT DISTINCT gram FROM dg WHERE doc_id % 20 = 0),
      corpus AS (SELECT doc_id, gram FROM dg WHERE doc_id % 20 <> 0),
      tot AS (SELECT doc_id, count(*) AS total_grams FROM corpus GROUP BY doc_id),
      hit AS (
        SELECT c.doc_id, count(*) AS matched
        FROM corpus c JOIN bench b USING (gram) GROUP BY c.doc_id)
      SELECT t.doc_id,
        CAST(t.total_grams AS INT) AS total_grams,
        CAST(coalesce(h.matched, 0) AS INT) AS matched_grams,
        CAST(CASE WHEN coalesce(h.matched, 0) > 0 THEN 1 ELSE 0 END AS INT) AS contaminated
      FROM tot t LEFT JOIN hit h ON h.doc_id = t.doc_id""")),

    // Gopher-style repetition quality signals as EXACT integers (the
    // published filters threshold duplicate-word and top-bigram ratios;
    // ratios derive from these counts, the oracle compares the counts).
    // Per-row codegen'd kernel — no shuffle, no explode.
    ("q120_repetition", (s: SparkSession, dir: String) => {
      docs(s, dir).select(col("doc_id"), repetition_stats(col("text")).as("r"))
        .select(col("doc_id"),
          col("r").getItem(0).as("total_words"),
          col("r").getItem(1).as("distinct_words"),
          col("r").getItem(2).as("top_word_count"),
          col("r").getItem(3).as("total_bigrams"),
          col("r").getItem(4).as("top_bigram_count"))
    }, Some("""
      WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
        FROM documents),
      tok AS (SELECT doc_id, unnest(ws) AS t FROM w),
      wc AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
      agg AS (
        SELECT doc_id, CAST(sum(c) AS INT) AS total_words,
               CAST(count(*) AS INT) AS distinct_words,
               CAST(max(c) AS INT) AS top_word_count
        FROM wc GROUP BY doc_id),
      bg AS (
        SELECT doc_id, ws[i] || ' ' || ws[i+1] AS b
        FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)),
      bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
      bagg AS (
        SELECT doc_id, CAST(sum(c) AS INT) AS total_bigrams,
               CAST(max(c) AS INT) AS top_bigram_count
        FROM bc GROUP BY doc_id)
      SELECT a.doc_id, a.total_words, a.distinct_words, a.top_word_count,
             coalesce(b.total_bigrams, 0) AS total_bigrams,
             coalesce(b.top_bigram_count, 0) AS top_bigram_count
      FROM agg a LEFT JOIN bagg b ON b.doc_id = a.doc_id""")),

    // Gopher quality-rule filter (Rae et al. 2021 §A1.1): the full rule
    // set over exact integer counters, thresholds cross-multiplied so no
    // division ever happens. The fixture text is a single line of ASCII
    // words, so the query first derives a structured text with plain
    // left-to-right replaces (newline+bullet after ' agg ', '#' after
    // ' the ') — identical replace semantics in both engines, keeping
    // every line/symbol rule non-degenerate AND bit-mirrorable.
    ("q132_gopher_filter", (s: SparkSession, dir: String) => {
      val st = replace(replace(col("text"),
          lit(" agg "), lit(" agg...\n- ")), lit(" the "), lit(" the #"))
      docs(s, dir).select(col("doc_id"), gopher_stats(st).as("g"))
        .select(col("doc_id"),
          col("g")(0).as("n_words"), col("g")(1).as("sum_word_len"),
          col("g")(2).as("n_alpha_words"), col("g")(3).as("n_stop_hits"),
          col("g")(4).as("n_lines"), col("g")(5).as("n_bullet_lines"),
          col("g")(6).as("n_ellipsis_lines"), col("g")(7).as("n_hash"),
          col("g")(8).as("n_ellipsis"))
        .withColumn("gopher_pass",
          col("n_words") >= 50 && col("n_words") <= 100000 &&
          lit(3) * col("n_words") <= col("sum_word_len") &&
          col("sum_word_len") <= lit(10) * col("n_words") &&
          lit(10) * (col("n_hash") + col("n_ellipsis")) <= col("n_words") &&
          lit(10) * col("n_bullet_lines") <= lit(9) * col("n_lines") &&
          lit(10) * col("n_ellipsis_lines") <= lit(3) * col("n_lines") &&
          lit(5) * col("n_alpha_words") >= lit(4) * col("n_words") &&
          col("n_stop_hits") >= 2)
    }, Some("""
      WITH s AS (
        SELECT doc_id,
               replace(replace(text, ' agg ', ' agg...' || chr(10) || '- '), ' the ', ' the #') AS t
        FROM documents),
      w AS (SELECT doc_id, t,
                   list_filter(string_split_regex(t, '\s+'), x -> x <> '') AS ws
            FROM s),
      tok AS (SELECT doc_id, unnest(ws) AS tk FROM w),
      wagg AS (
        SELECT doc_id, CAST(count(*) AS INT) AS n_words,
               CAST(sum(len(tk)) AS INT) AS sum_word_len,
               CAST(sum(CASE WHEN regexp_matches(tk, '[a-zA-Z]') THEN 1 ELSE 0 END) AS INT) AS n_alpha_words,
               CAST(sum(CASE WHEN lower(tk) IN ('the','be','to','of','and','that','have','with') THEN 1 ELSE 0 END) AS INT) AS n_stop_hits
        FROM tok GROUP BY doc_id),
      ln AS (SELECT doc_id, unnest(string_split(t, chr(10))) AS l FROM w),
      lagg AS (
        SELECT doc_id, CAST(count(*) AS INT) AS n_lines,
               CAST(sum(CASE WHEN starts_with(l, '- ') OR starts_with(l, '* ') THEN 1 ELSE 0 END) AS INT) AS n_bullet_lines,
               CAST(sum(CASE WHEN ends_with(l, '...') THEN 1 ELSE 0 END) AS INT) AS n_ellipsis_lines
        FROM ln GROUP BY doc_id),
      sym AS (
        SELECT doc_id,
               CAST(len(t) - len(replace(t, '#', '')) AS INT) AS n_hash,
               CAST((len(t) - len(replace(t, '...', ''))) // 3 AS INT) AS n_ellipsis
        FROM w)
      SELECT s.doc_id,
             COALESCE(wa.n_words, 0) AS n_words,
             COALESCE(wa.sum_word_len, 0) AS sum_word_len,
             COALESCE(wa.n_alpha_words, 0) AS n_alpha_words,
             COALESCE(wa.n_stop_hits, 0) AS n_stop_hits,
             la.n_lines, la.n_bullet_lines, la.n_ellipsis_lines,
             sym.n_hash, sym.n_ellipsis,
             (COALESCE(wa.n_words, 0) >= 50 AND COALESCE(wa.n_words, 0) <= 100000
              AND 3 * COALESCE(wa.n_words, 0) <= COALESCE(wa.sum_word_len, 0)
              AND COALESCE(wa.sum_word_len, 0) <= 10 * COALESCE(wa.n_words, 0)
              AND 10 * (sym.n_hash + sym.n_ellipsis) <= COALESCE(wa.n_words, 0)
              AND 10 * la.n_bullet_lines <= 9 * la.n_lines
              AND 10 * la.n_ellipsis_lines <= 3 * la.n_lines
              AND 5 * COALESCE(wa.n_alpha_words, 0) >= 4 * COALESCE(wa.n_words, 0)
              AND COALESCE(wa.n_stop_hits, 0) >= 2) AS gopher_pass
      FROM s
      LEFT JOIN wagg wa ON wa.doc_id = s.doc_id
      JOIN lagg la ON la.doc_id = s.doc_id
      JOIN sym ON sym.doc_id = s.doc_id""")),

    // HLL distinct-token sketch per corpus stratum (SURVEY §2.4 "approx
    // distinct" — absent in OGR SQL; engine-native via ops.Hll). The
    // 20-bit capped-rho design keeps EVERY derived quantity int64-exact
    // (registers, zeros, position-weighted fingerprint, harmonic
    // denominator S = Σ 2^(21−reg)); the estimate is one double division
    // over those exact ints, so the oracle replays the whole sketch —
    // splitmix64 mixing, bucket/rho split, per-bucket max, S — bit-for-bit
    // and lands on the identical IEEE estimate. nd_exact rides along so
    // the result also exhibits the sketch's actual error.
    ("q166_hll_distinct", (s: SparkSession, dir: String) => {
      val toks = docs(s, dir)
        .select((col("doc_id") % 4).as("grp"),
          explode(split(col("text"), "\\s+")).as("w"))
        .filter(col("w") =!= "")
      val hashed = graft.pipeline.Caches.persist(
        toks.select(col("grp"), smix64(fnv64(col("w"))).as("h")))
      val regs = graft.ops.Hll.registers(hashed, Seq("grp"), "h", p = 8)
      val exact = hashed.groupBy(col("grp")).agg(countDistinct(col("h")).as("nd_exact"))
      graft.ops.Hll.withEstimate(regs, p = 8).join(exact, Seq("grp"))
        .select(col("grp"), col("zeros"), col("reg_fp"), col("s_scaled"),
          col("est_raw"), col("est"), col("nd_exact"))
    }, Some {
      val blenCase = "CASE " + (20 to 1 by -1)
        .map(b => s"WHEN w20 >= ${1L << (b - 1)} THEN $b").mkString(" ") + " ELSE 0 END"
      val powers = (0 to 21).map(i => 1L << i).mkString("[", ", ", "]")
      // the linear-counting lookup: the SAME driver-computed double
      // literals the Spark plan embeds (shortest-round-trip repr parses
      // to the identical double in both engines)
      val lc = graft.ops.Hll.lcTable(256).mkString("[", ", ", "]")
      s"""
      WITH RECURSIVE
      $toks0Cte,
      toks AS (SELECT row_number() OVER (ORDER BY doc_id) AS rid, doc_id, tok FROM toks0),
      ${fnvChainCte("toks")},
      ghash AS MATERIALIZED (
        SELECT t.doc_id % 4 AS grp, f.h
        FROM fnv f JOIN toks t ON t.rid = f.rid WHERE f.pos = length(t.tok)),
      sm0 AS (SELECT grp, CAST((CAST(h AS HUGEINT) + 11400714819323198485) % $U64 AS UBIGINT) AS z0 FROM ghash),
      sm0x AS (SELECT grp, xor(z0, z0 // 1073741824) AS y0 FROM sm0),
      sm1 AS (SELECT grp, ${limbMulSql("y0", 484763065L, 3210233709L)} AS z1 FROM sm0x),
      sm1x AS (SELECT grp, xor(z1, z1 // 134217728) AS y1 FROM sm1),
      sm2 AS (SELECT grp, ${limbMulSql("y1", 321982955L, 2496678331L)} AS z2 FROM sm1x),
      smh AS MATERIALIZED (SELECT grp, xor(z2, z2 // 2147483648) AS hh FROM sm2),
      hb AS (
        SELECT grp, hh // 72057594037927936 AS bucket,
               (hh // 68719476736) % 1048576 AS w20 FROM smh),
      regs0 AS (
        SELECT grp, bucket, max(21 - ($blenCase)) AS reg
        FROM hb GROUP BY grp, bucket),
      grps AS (SELECT DISTINCT grp FROM ghash),
      allb AS (
        SELECT g.grp, b.bucket FROM grps g,
          (SELECT CAST(unnest(generate_series(0, 255)) AS UBIGINT) AS bucket) b),
      regs AS (
        SELECT a.grp, a.bucket, COALESCE(r.reg, 0) AS reg
        FROM allb a LEFT JOIN regs0 r ON r.grp = a.grp AND r.bucket = a.bucket),
      summ AS (
        SELECT grp,
          CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS INT) AS zeros,
          CAST(sum(reg * (CAST(bucket AS BIGINT) + 1)) AS BIGINT) AS reg_fp,
          CAST(sum(($powers)[21 - reg + 1]) AS BIGINT) AS s_scaled
        FROM regs GROUP BY grp),
      ex AS (SELECT grp, CAST(count(DISTINCT hh) AS BIGINT) AS nd_exact FROM smh GROUP BY grp),
      summ2 AS (
        SELECT grp, zeros, reg_fp, s_scaled,
          0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 2097152.0
            / CAST(s_scaled AS DOUBLE) AS est_raw
        FROM summ)
      SELECT s.grp, s.zeros, s.reg_fp, s.s_scaled, s.est_raw,
        CASE WHEN s.zeros > 0 AND s.est_raw <= 640.0
             THEN ($lc)[s.zeros] ELSE s.est_raw END AS est,
        e.nd_exact
      FROM summ2 s JOIN ex e ON e.grp = s.grp"""
    }),

    // Exact token-count quantile profile per language (ops.Quantiles —
    // the data-card / skew-profiling aggregation). Histogram-first shape:
    // the shuffle carries one row per DISTINCT (lang, token_count), the
    // running-sum window is bounded by the value domain, and p{q} =
    // min v with 100·cum ≥ q·n — integer-exact inverse CDF, so the
    // oracle is the same arithmetic verbatim (no percentile function
    // semantics to reconcile between engines).
    ("q167_token_quantiles", (s: SparkSession, dir: String) => {
      val vals = docs(s, dir).select(col("lang"),
        size(filter(split(col("text"), "\\s+"), w => w =!= "")).as("v"))
      graft.ops.Quantiles.profile(vals, "lang", "v", Seq(25, 50, 75, 90, 99))
    }, Some("""
      WITH v AS (
        SELECT lang,
          CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS INT) AS v
        FROM documents),
      c AS (SELECT lang, v, count(*) AS c FROM v GROUP BY lang, v),
      cum AS (SELECT lang, v, c, sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum FROM c),
      t AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY lang)
      SELECT t.lang, t.n,
        CAST(min(CASE WHEN 100 * cum.cum >= 25 * t.n THEN cum.v END) AS INT) AS p25,
        CAST(min(CASE WHEN 100 * cum.cum >= 50 * t.n THEN cum.v END) AS INT) AS p50,
        CAST(min(CASE WHEN 100 * cum.cum >= 75 * t.n THEN cum.v END) AS INT) AS p75,
        CAST(min(CASE WHEN 100 * cum.cum >= 90 * t.n THEN cum.v END) AS INT) AS p90,
        CAST(min(CASE WHEN 100 * cum.cum >= 99 * t.n THEN cum.v END) AS INT) AS p99
      FROM cum JOIN t ON t.lang = cum.lang
      GROUP BY t.lang, t.n""")),

    // Count-Min heavy-hitter probe (ops.Cms — the "how hot are the hot
    // keys" monitor run before picking a join salt factor). One 4×256
    // int64 counter matrix over every token occurrence; probed terms
    // report est = min over the 4 hashed counters (≥ true by
    // construction) next to the exact count. All-integer, so the oracle
    // re-derives the probed counters from scratch: per-occurrence FNV
    // hashes → the same splitmix64(x + r·golden) bucket chain (limb-split
    // HUGEINT) → per-(row, bucket) sums; probe buckets are driver-computed
    // constants from the same kernel (the q46 perm-constant pattern).
    ("q168_cms_heavyhitters", (s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = docs(s, dir)
        .select(explode(split(col("text"), "\\s+")).as("w")).filter(col("w") =!= "")
      val hp = graft.pipeline.Caches.persist(toks.select(fnv64(col("w")).as("x"), col("w")))
      val m = graft.ops.Cms.sketch(hp, Nil, "x", d = 4, w = 256)
      val probes = CmsProbeTerms.toDF("term").withColumn("x", fnv64(col("term")))
      val tcnt = hp.groupBy(col("w").as("term")).agg(count(lit(1)).as("tc"))
      probes.crossJoin(m)
        .withColumn("est", graft.ops.Cms.estimate(col("m"), col("x"), d = 4, w = 256))
        .join(tcnt, Seq("term"), "left")
        .select(col("term"), col("est"), coalesce(col("tc"), lit(0L)).as("true_cnt"))
    }, Some {
      val probeVals = CmsProbeTerms.flatMap { t =>
        val x = graft.text.TextKernels.fnv1a64(t)
        (0 until 4).map { r =>
          val b = graft.text.TextKernels.splitmix64(x + r * graft.ops.Cms.Golden) & 255L
          s"('$t', $r, $b)"
        }
      }.mkString(", ")
      val terms = CmsProbeTerms.map(t => s"('$t')").mkString(", ")
      s"""
      WITH RECURSIVE
      $toks0Cte,
      tun AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks0 GROUP BY tok),
      toks AS (SELECT row_number() OVER (ORDER BY tok) AS rid, tok, n FROM tun),
      ${fnvChainCte("toks")},
      hc AS MATERIALIZED (
        SELECT f.h, CAST(sum(t.n) AS BIGINT) AS n
        FROM fnv f JOIN toks t ON t.rid = f.rid WHERE f.pos = length(t.tok)
        GROUP BY f.h),
      rx(r) AS (VALUES (0), (1), (2), (3)),
      cs AS (
        SELECT h, n, r,
          CAST((CAST(h AS HUGEINT) + r * 2654435769 + 11400714819323198485) % $U64 AS UBIGINT) AS z0
        FROM hc, rx),
      csx AS (SELECT h, n, r, xor(z0, z0 // 1073741824) AS y0 FROM cs),
      cm1 AS (SELECT h, n, r, ${limbMulSql("y0", 484763065L, 3210233709L)} AS z1 FROM csx),
      cm1x AS (SELECT h, n, r, xor(z1, z1 // 134217728) AS y1 FROM cm1),
      cm2 AS (SELECT h, n, r, ${limbMulSql("y1", 321982955L, 2496678331L)} AS z2 FROM cm1x),
      cb AS (SELECT r, CAST(xor(z2, z2 // 2147483648) % 256 AS BIGINT) AS b, n FROM cm2),
      cnt AS (SELECT r, b, CAST(sum(n) AS BIGINT) AS c FROM cb GROUP BY r, b),
      pb(term, r, b) AS (VALUES $probeVals),
      pest AS (
        SELECT term, min(coalesce(c.c, CAST(0 AS BIGINT))) AS est
        FROM pb LEFT JOIN cnt c ON c.r = pb.r AND c.b = pb.b GROUP BY term),
      tc AS (SELECT tok, n AS true_cnt FROM tun),
      pt(term) AS (VALUES $terms)
      SELECT p.term, pe.est, coalesce(t.true_cnt, CAST(0 AS BIGINT)) AS true_cnt
      FROM pt p JOIN pest pe ON pe.term = p.term
      LEFT JOIN tc t ON t.tok = p.term"""
    })
  )

  /** q168 probe set: frequent corpus words + one guaranteed-absent term
    * (est must still report the collision floor ≥ 0, true_cnt = 0). */
  private def CmsProbeTerms = Seq("the", "spark", "window", "vector", "merge", "qqqzzz")

  private def SampleRates = Map(
    "en" -> 250000L, "fr" -> 500000L, "es" -> 100000L, "de" -> 750000L, "zh" -> 50000L)

  private def sampleRateCaseSql: String =
    "CAST(CASE lang " + SampleRates.toSeq.sortBy(_._1)
      .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ") + " ELSE 0 END AS BIGINT)"

  /** One limb-split (32×32-bit) multiply of UBIGINT column `y` by the
    * constant clo + chi·2³², reduced mod 2⁶⁴ — the q46 overflow-safe
    * pattern (DuckDB HUGEINT holds every intermediate exactly). */
  private[queries] def limbMulSql(y: String, clo: Long, chi: Long): String =
    s"""CAST((($clo * (CAST($y AS HUGEINT) % 4294967296)
         + (($clo * (CAST($y AS HUGEINT) // 4294967296)
             + $chi * (CAST($y AS HUGEINT) % 4294967296)) % 4294967296) * 4294967296)
        % $U64) AS UBIGINT)"""

  /** CTE chain re-deriving TextKernels.splitmix64(doc_id) and the sampling
    * bucket (unsigned residue mod 1e6): `smb(doc_id, lang, bucket)`. */
  /** splitmix64 sampling-bucket mirror over any source: `src` must expose
    * an id column `idCol` plus the carried columns `carry` (comma-joined,
    * may be empty); ends at CTE `smb(idCol, carry…, bucket)`. */
  private[queries] def smixCtes(src: String, idCol: String, carry: String): String = {
    val c = if (carry.isEmpty) "" else s"$carry,"
    s"""
      sm0 AS (
        SELECT $idCol, $c
          CAST((CAST($idCol AS HUGEINT) + 11400714819323198485) % $U64 AS UBIGINT) AS z0
        FROM $src),
      sm0x AS (SELECT $idCol, $c xor(z0, z0 // 1073741824) AS y0 FROM sm0),
      sm1 AS (SELECT $idCol, $c ${limbMulSql("y0", 484763065L, 3210233709L)} AS z1 FROM sm0x),
      sm1x AS (SELECT $idCol, $c xor(z1, z1 // 134217728) AS y1 FROM sm1),
      sm2 AS (SELECT $idCol, $c ${limbMulSql("y1", 321982955L, 2496678331L)} AS z2 FROM sm1x),
      smh AS (SELECT $idCol, $c xor(z2, z2 // 2147483648) AS h FROM sm2),
      smb AS (SELECT $idCol, $c CAST(h % 1000000 AS BIGINT) AS bucket FROM smh)"""
  }

  private def sampleBucketCtes: String = smixCtes("documents", "doc_id", "lang")

  private def Bm25Terms = Seq("spark", "window", "vector", "merge")

  private def bm25OracleSql: String = {
    val ts = Bm25Terms
    val tfDefs = ts.map(t =>
      s"CAST(len(list_filter(string_split(text, ' '), x -> x = '$t')) AS BIGINT) AS tf_$t").mkString(",\n        ")
    val dfDefs = ts.map(t =>
      s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t").mkString(",\n        ")
    val termScore = ts.map { t =>
      s"""((CAST(2 * g.n - 2 * g.df_$t + 1 AS DOUBLE) / CAST(2 * g.df_$t + 1 AS DOUBLE))
           * (CAST(22 * t.tf_$t * g.s AS DOUBLE)
              / CAST(10 * t.tf_$t * g.s + 3 * g.s + 9 * t.dl * g.n AS DOUBLE)))"""
    }.reduceLeft((a, b) => s"($a + $b)")
    val tfSel = ts.map(t => s"t.tf_$t").mkString(", ")
    s"""
      WITH tf AS (
        SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
          $tfDefs
        FROM documents),
      g AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS s,
        $dfDefs
        FROM tf),
      scored AS (
        SELECT t.doc_id, t.dl, $tfSel, $termScore AS score
        FROM tf t, g)
      SELECT * FROM (
        SELECT doc_id, dl, ${ts.map(t => s"tf_$t").mkString(", ")}, score,
          CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
        FROM scored) WHERE rank <= 50"""
  }
}
