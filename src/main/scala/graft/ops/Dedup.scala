package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.textfunctions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale shape: every variant reduces to hash-keyed groupBy / equi-join —
  * no pairwise O(n²) stage ever touches the full corpus; candidate
  * generation (LSH bands, simhash chunks) bounds comparisons to colliding
  * buckets only. At 100 TB the band-explode factor (rows × bands) is the
  * only amplification, and bands are small ints.
  *
  * HOT-BUCKET GUARD: a mass-duplicate corpus (a million identical docs)
  * puts every copy in one bucket and the banded self-join goes quadratic
  * inside it. Both candidate generators therefore (a) expect exact dedup
  * to run FIRST (it exists and is cheap), and (b) cap bucket size at
  * `maxBucket`, dropping over-full buckets from pair generation. Dropped
  * buckets are observable via [[hotBuckets]] — count/log them in the
  * pipeline rather than silently truncating.
  */
object Dedup {

  /** Exact dedup on content hash: one row per distinct text, keeping the
    * minimum id (deterministic winner). Run this BEFORE any near-dup
    * candidate generator — it collapses the pathological buckets. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"))

  /** Buckets larger than `maxBucket` for a banded frame (band, bkey) —
    * the observability hook for the hot-bucket cap. */
  def hotBuckets(banded: DataFrame, maxBucket: Int): DataFrame =
    banded.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)

  private def capBuckets(banded: DataFrame, maxBucket: Int): DataFrame =
    if (maxBucket <= 0) banded
    else {
      // Hot buckets are RARE by definition (the cap exists for
      // pathological mass-duplicate keys), so compute only the over-full
      // (band, bkey) list — small — and broadcast it into an anti-join:
      // the banded frame is never shuffled BY THE CAP; its exchange
      // happens once in the self-join and is plan-reused for both sides.
      // At sf0.1 every cap formulation (this, ok-list join, window count)
      // measures the same ≈ +0.8 s of fixed stage latency over no-cap —
      // a per-query constant, not a function of corpus size; this shape
      // is kept because an unshuffled probe side is the right plan at
      // 100 TB, where the banded frame is the big one.
      val hot = banded.groupBy(col("band"), col("bkey"))
        .agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") > maxBucket)
        .drop("__bn")
      banded.join(broadcast(hot), Seq("band", "bkey"), "left_anti")
    }

  /** MinHash-LSH candidate pairs: k-hash signature over char shingles,
    * banded into `bands` groups of k/bands rows; pairs colliding in ≥1 band
    * are candidates (classic Broder/LSH; each pair reported once with the
    * number of colliding bands). Buckets larger than `maxBucket` are
    * dropped (see class doc). */
  def minhashCandidates(docs: DataFrame, k: Int = 64, bands: Int = 16, shingle: Int = 5,
                        idCol: String = "doc_id", textCol: String = "text",
                        maxBucket: Int = 100000): DataFrame = {
    // spread narrow-split corpora before the signature pass (no-op at scale)
    val sig = graft.pipeline.Spread.toCores(docs)
      .select(col(idCol).as("id"), minhash_sig(col(textCol), k, shingle).as("sig"))
    minhashCandidatesFromSigs(sig, k, bands, maxBucket)
  }

  /** [[minhashCandidates]] over a PRECOMPUTED signature frame
    * (`id`, `sig`: array<long> of length k) — the entry point when the
    * caller fuses signature computation with other per-doc kernels (e.g.
    * q118 computes sig + verify shingle set in ONE projection, so the
    * corpus text is scanned once and never cached). Identical candidates. */
  def minhashCandidatesFromSigs(sigIn: DataFrame, k: Int = 64, bands: Int = 16,
                                maxBucket: Int = 100000): DataFrame = {
    require(bands >= 1 && k % bands == 0, s"k=$k must be a multiple of bands=$bands")
    // fail LOUDLY on a signature-length mismatch: element_at past the
    // array end is null (non-ANSI), which would null the band keys and
    // make the null-rejecting self-join report ZERO candidates — a
    // silent no-duplicates verdict. assert_true rides the row scan.
    val sig = sigIn.filter(
      assert_true(size(col("sig")) === lit(k),
        lit(s"minhash signature length != $k")).isNull)
    val rows = k / bands
    // PERSIST the banded signatures: they are consumed by the cap's
    // groupBy, the cap's join probe, AND both sides of the self-join —
    // without the cache Spark recomputes every doc's minhash ~4×, and at
    // scale signature computation dominates dedup cost. Released by the
    // harness via pipeline.Caches.release() after materialization.
    val banded = graft.pipeline.Caches.persist(sig.select(col("id"), posexplode(
      // Band key = XOR of each slice element rotated left by 13·position.
      // Positional rotations make the key order-sensitive; pure bit ops
      // (no multiply) keep it ANSI-overflow-safe AND exactly replicable
      // in the DuckDB oracle (rot-left = HUGEINT mul/div, XOR = bit_xor),
      // unlike Spark's internal Murmur3 hash().
      expr(s"""transform(sequence(0, ${bands - 1}), b ->
        aggregate(
          transform(sequence(0, ${rows - 1}), i ->
            shiftleft(element_at(sig, b*$rows + i + 1), CAST((13*i) % 64 AS INT)) |
            shiftrightunsigned(element_at(sig, b*$rows + i + 1), CAST((64 - ((13*i) % 64)) % 64 AS INT))),
          0L, (acc, x) -> acc ^ x))""")
    ).as(Seq("band", "bkey"))))
    val capped = capBuckets(banded, maxBucket)
    capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** SimHash near-dup candidates: the 64-bit simhash splits into
    * `nChunks` nearly-equal bit ranges; by pigeonhole, Hamming distance ≤
    * nChunks−1 ⇒ some chunk matches exactly — join on (chunk, value),
    * verify Hamming ≤ maxHamming. Callers wanting a RECALL GUARANTEE must
    * pass nChunks ≥ maxHamming+1 (more chunks = shorter chunk values =
    * denser buckets: the selectivity/recall tradeoff). Over-full buckets
    * are dropped per the hot-bucket cap. */
  def simhashCandidates(docs: DataFrame, maxHamming: Int = 3, nChunks: Int = 4,
                        idCol: String = "doc_id", textCol: String = "text",
                        maxBucket: Int = 100000): DataFrame = {
    require(nChunks >= 1 && nChunks <= 64, "nChunks in [1, 64]")
    val sh = graft.pipeline.Spread.toCores(docs)
      .select(col(idCol).as("id"), simhash64(col(textCol)).as("sh"))
    // chunk c covers bits [64c/n, 64(c+1)/n)
    val chunkExprs = (0 until nChunks).map { c =>
      val s = 64 * c / nChunks
      val len = 64 * (c + 1) / nChunks - s
      val mask = if (len >= 64) -1L else (1L << len) - 1
      expr(s"(sh >> $s) & ${mask}L")
    }
    // persist for the same 4-consumer reason as minhashCandidates
    val chunked = graft.pipeline.Caches.persist(sh.select(col("id"), col("sh"),
      posexplode(array(chunkExprs: _*)).as(Seq("band", "bkey"))))
    val capped = capBuckets(chunked, maxBucket)
    capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Hamming near-dup join over a PRECOMPUTED 64-bit hash column — the
    * image-corpus entry point: the north-star input table carries
    * `phash:int64` per image (BASELINE.json input_hint), and near-duplicate
    * image detection is a Hamming-ball self-join on it. Multi-index
    * pigeonhole (Norouzi et al., "Fast Search in Hamming Space with
    * Multi-Index Hashing"): split the 64 bits into `nChunks` nearly-equal
    * ranges; any pair within Hamming distance ≤ nChunks−1 agrees exactly on
    * some chunk, so an equi-join on (chunk, value) has PERFECT recall for
    * maxHamming ≤ nChunks−1 (enforced) — unlike the text LSH generators
    * this variant misses nothing. Pairs are then verified exactly with
    * bit_count(xor).
    *
    * Scale shape: rows × nChunks explode of (id, hash) only — 3 small ints
    * per banded row; one equi-join shuffle keyed by (chunk, value); exact
    * verify is a codegen'd map on the joined pairs. Hot buckets (mass
    * duplicate images ⇒ one bucket goes quadratic) capped as in the text
    * generators, observable via [[hotBuckets]]. */
  def hammingNearDup(df: DataFrame, hashCol: String, idCol: String,
                     maxHamming: Int = 3, nChunks: Int = 4,
                     maxBucket: Int = 100000): DataFrame = {
    require(nChunks >= 1 && nChunks <= 64, "nChunks in [1, 64]")
    require(maxHamming <= nChunks - 1,
      s"pigeonhole recall guarantee needs nChunks >= maxHamming+1 (got $nChunks chunks, distance $maxHamming)")
    val base = df.select(col(idCol).as("id"), col(hashCol).as("h"))
    val chunkExprs = (0 until nChunks).map { c =>
      val s = 64 * c / nChunks
      val len = 64 * (c + 1) / nChunks - s
      val mask = if (len >= 64) -1L else (1L << len) - 1
      expr(s"shiftrightunsigned(h, $s) & ${mask}L")
    }
    val banded = base.select(col("id"), col("h"),
      posexplode(array(chunkExprs: _*)).as(Seq("band", "bkey")))
    val capped = capBuckets(banded, maxBucket)
    capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).as("hamming"))
      .distinct() // a pair may agree on several chunks
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-duplicate pairs — the embedding-space analog of
    * [[minhashCandidates]]/[[simhashCandidates]]: candidates come from
    * random-hyperplane (Rademacher) LSH band buckets (two vectors are
    * candidates iff a whole `nBits/bands`-bit signature band agrees — the
    * q50 ANN signature reused for DEDUP), then each candidate pair is
    * verified by an EXACT quantized cosine test. The accept rule avoids
    * sqrt: cos(a,b) ≥ τ  ⇔  qdot ≥ 0  ∧  qdot² ≥ τ²·qnorm²(a)·qnorm²(b),
    * evaluated over the int64-exact quantized dot/norms (Ann.Scale
    * discipline) with a FIXED double operation order, so a SQL oracle
    * replicates the comparison bit-for-bit. Recall < 1 by LSH construction
    * (pairs whose signatures agree on no band are never tested) — the
    * same honest contract as the text candidate generators.
    *
    * Scale shape: one scan computes (id, emb, qnorm, signature) and is
    * persisted (released by the harness via pipeline.Caches); the banded
    * frame carries ONLY (id, band, bkey) — embeddings never ride the band
    * explode or the self-join shuffle; they re-attach by id equi-join on
    * the deduped pair list. Hot buckets are capped as in the text dedups
    * (an all-zeros embedding corpus would otherwise go quadratic in one
    * bucket). */
  def cosineNearDup(embs: DataFrame, tau: Double, nBits: Int = 16, bands: Int = 4,
                    idCol: String = "vec_id", embCol: String = "embedding",
                    maxBucket: Int = 100000, seed: Long = 42L): DataFrame = {
    require(tau >= 0.0 && tau <= 1.0, "tau in [0, 1] (negative-cosine dedup is not a near-DUP test)")
    require(nBits % bands == 0, "bands must divide nBits")
    val rowsPerBand = nBits / bands
    val mask = (1L << rowsPerBand) - 1
    // one corpus scan: id, embedding, quantized norm², hyperplane signature
    val base = graft.pipeline.Caches.persist(
      graft.pipeline.Spread.toCores(embs).select(
        col(idCol).as("id"), col(embCol).as("emb"),
        Ann.qnorm(embCol).as("qn"),
        rademacher_sig(
          expr(s"transform($embCol, x -> cast(x as double))"), nBits, seed).as("__sig")))
    val banded = base.select(col("id"), posexplode(
      expr(s"transform(sequence(0, ${bands - 1}), b -> (__sig >> (b * $rowsPerBand)) & $mask)"))
      .as(Seq("band", "bkey")))
    val capped = capBuckets(banded, maxBucket)
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct() // a pair may collide in several bands
    val tau2 = tau * tau
    pairs
      .join(base.select(col("id").as("id_a"), col("emb").as("__ea"), col("qn").as("qn_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("emb").as("__eb"), col("qn").as("qn_b")), Seq("id_b"))
      .withColumn("qdot", Ann.qdot("__ea", "__eb"))
      // fixed order: (qdot·qdot) ≥ ((τ²·qn_a)·qn_b) — mirrored verbatim in SQL
      .filter(col("qdot") >= 0L &&
        col("qdot").cast("double") * col("qdot").cast("double") >=
          (lit(tau2) * col("qn_a").cast("double")) * col("qn_b").cast("double"))
      .select(col("id_a"), col("id_b"), col("qdot"), col("qn_a"), col("qn_b"))
  }

  /** SemDeDup — semantic deduplication via k-means cluster candidates
    * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    * through semantic deduplication"): train a coarse quantizer on the
    * embedding corpus ([[Kmeans.fit]]), generate candidate pairs ONLY
    * within each cluster, verify each pair with the EXACT quantized
    * cosine test of [[cosineNearDup]], and drop every vector that has a
    * verified near-duplicate with a smaller id in its cluster (the
    * min-id representative rule of the exact-dedup family — one kept row
    * per duplicate chain head). Returns one row per input vector:
    * (idCol, cell, dropped).
    *
    * Recall contract (honest, like the LSH generators): pairs split
    * across two clusters are never tested — the published SemDeDup
    * tradeoff; raising k shrinks clusters (cost) and lowers recall.
    *
    * Scale shape: training touches the corpus `iters+1` times but only
    * map + k-row aggregates (see Kmeans); the final assignment is one
    * more codegen'd map. The only quadratic stage is the within-cluster
    * self-join — bounded because k is chosen to keep clusters at
    * ~corpus/k (the paper's regime), with the hot-bucket cap excluding
    * any degenerate cluster beyond `maxCluster` (an all-identical
    * corpus would otherwise go quadratic in one cell). Embeddings never
    * ride the pair shuffle: pairs carry ids, embeddings re-attach by id
    * for the verify. */
  def semDedup(embs: DataFrame, k: Int, iters: Int, tau: Double,
               idCol: String = "vec_id", embCol: String = "embedding",
               maxCluster: Int = 100000): DataFrame = {
    require(tau >= 0.0 && tau <= 1.0, "tau in [0, 1]")
    val fit = Kmeans.fit(embs, idCol, embCol, k, iters)
    val base = graft.pipeline.Caches.persist(
      graft.pipeline.Spread.toCores(embs).select(
        col(idCol).cast("long").as("id"),
        col(embCol).as("emb"),
        Ann.qnorm(embCol).as("qn"),
        element_at(graft.expr.functions.kmeans_assign(
            graft.expr.functions.quantize_emb(col(embCol)), fit.model), 1)
          .cast("int").as("cell")))
    val cand = capBuckets(
      base.select(col("id"), lit(0).as("band"), col("cell").cast("long").as("bkey")),
      maxCluster)
    val pairs = cand.as("a").join(cand.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val tau2 = tau * tau
    val dropped = pairs
      .join(base.select(col("id").as("id_a"), col("emb").as("__ea"), col("qn").as("qn_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("emb").as("__eb"), col("qn").as("qn_b")), Seq("id_b"))
      .withColumn("qdot", Ann.qdot("__ea", "__eb"))
      // the q105 accept rule, fixed double op order — mirrored in SQL
      .filter(col("qdot") >= 0L &&
        col("qdot").cast("double") * col("qdot").cast("double") >=
          (lit(tau2) * col("qn_a").cast("double")) * col("qn_b").cast("double"))
      .select(col("id_b").as("id")).distinct()
    base.select(col("id"), col("cell"))
      .join(dropped.withColumn("__dup", lit(true)), Seq("id"), "left")
      .select(col("id").as(idCol), col("cell"),
        coalesce(col("__dup"), lit(false)).as("dropped"))
  }

  /** Corpus-wide duplicated-span removal (the C4/RefinedWeb "remove any
    * span seen before" pass, segment granularity): documents split into
    * consecutive non-overlapping windows of `w` words; a segment is KEPT
    * only at its global first occurrence, ordered by (doc_id, seg_no).
    * Returns per-doc (doc_id, total_segs, kept_segs).
    *
    * Shape at scale: segmentation is a codegen'd builtin-HOF map (split/
    * transform/slice — no UDF). The first-occurrence decision is a
    * `groupBy(seg).agg(min(struct(doc_id, seg_no)))` — NEVER a
    * `Window.partitionBy(seg)`: a mass-duplicated span (boilerplate,
    * exactly what this operator targets) would put every copy of the hot
    * segment into ONE task's window sort, while partial (map-side)
    * aggregation reduces each task's copies of the hot segment to a
    * single row BEFORE the exchange. The winners frame is one row per
    * DISTINCT segment; per-doc kept counts then shuffle by doc id only.
    * At 100 TB swap the agg key to xxhash64(seg) and keep the text only
    * for collision checks — same plan shape, 8-byte shuffle keys. */
  def segmentDedup(docs: DataFrame, w: Int,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val segs = graft.pipeline.Caches.persist(docs
      .filter(length(col(textCol)) > 0)
      .select(col(idCol),
        expr(s"transform(sequence(0, int(ceil(size(split($textCol, ' ')) / ${w}.0)) - 1), " +
          s"i -> array_join(slice(split($textCol, ' '), i * $w + 1, $w), ' '))").as("__segs"))
      .select(col(idCol), posexplode(col("__segs")).as(Seq("seg_no", "seg"))))
    val totals = segs.groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("total_segs"))
    // min(struct) == the (doc_id, seg_no)-lexicographic first occurrence:
    // identical to rn=1 under ORDER BY (doc_id, seg_no), but skew-immune.
    val kept = segs.groupBy(col("seg"))
      .agg(min(struct(col(idCol), col("seg_no"))).as("__first"))
      .select(col(s"__first.$idCol").as(idCol))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("kept_segs"))
    totals.join(kept, Seq(idCol), "left")
      .withColumn("kept_segs", coalesce(col("kept_segs"), lit(0)).cast("int"))
  }

  /** Exact n-gram Jaccard on candidate pairs (verification stage after any
    * candidate generator): expects (id_a, id_b) plus the docs table. */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, shingle: Int = 3, minJaccard: Double = 0.0,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val d = docs.select(col(idCol), col(textCol))
    pairs
      .join(d.select(col(idCol).as("id_a"), col(textCol).as("__ta")), Seq("id_a"))
      .join(d.select(col(idCol).as("id_b"), col(textCol).as("__tb")), Seq("id_b"))
      .withColumn("__ov", shingle_overlap(col("__ta"), col("__tb"), shingle))
      .withColumn("inter", col("__ov")(0))
      .withColumn("uni", col("__ov")(1))
      .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .drop("__ta", "__tb", "__ov")
  }

  /** [[jaccardVerify]] over PRECOMPUTED shingle-hash sets: `shingled` =
    * (idCol, `sh`: sorted distinct char-shingle hashes, from
    * `char_shingles`). Identical accept decisions (the string path
    * compares the same FNV64 sets), but each document is shingled ONCE
    * instead of once per candidate pair — the right trade when candidate
    * multiplicity is high (a near-dup-heavy corpus re-shingles every
    * popular doc per pair). Cost: the attach joins carry the hash
    * arrays (~8 bytes/char vs 1 for text); choose by multiplicity. */
  def jaccardVerifyHashed(pairs: DataFrame, shingled: DataFrame, minJaccard: Double = 0.0,
                          idCol: String = "doc_id"): DataFrame = {
    val d = shingled.select(col(idCol), col("sh"))
    pairs
      .join(d.select(col(idCol).as("id_a"), col("sh").as("__sa")), Seq("id_a"))
      .join(d.select(col(idCol).as("id_b"), col("sh").as("__sb")), Seq("id_b"))
      .withColumn("__ov", sorted_overlap(col("__sa"), col("__sb")))
      .withColumn("inter", col("__ov")(0))
      .withColumn("uni", col("__ov")(1))
      .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .drop("__sa", "__sb", "__ov")
  }
}
