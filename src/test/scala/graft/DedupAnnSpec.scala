package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Ann, Dedup}
import graft.text.TextKernels

class DedupAnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def nearDupDocs = {
    val base = "the quick brown fox jumps over the lazy dog and then runs far away into the quiet green forest tonight"
    Seq(
      (1L, base),
      (2L, base),                                             // exact dup of 1
      (3L, base.replace("quick", "swift")),                   // near dup of 1
      (4L, "completely different content about spark catalyst optimizer rules and shuffle partitions in a cluster"),
      (5L, base.replace("dog", "cat").replace("forest", "meadow")) // near dup
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts") {
    val res = Dedup.exact(nearDupDocs).as[(String, Long, Long)].collect()
    assert(res.length == 4)
    val dupGroup = res.find(_._2 == 2).get
    assert(dupGroup._3 == 1L, "keeps the min doc_id")
  }

  test("minhash LSH finds near-dups and skips unrelated docs") {
    val cand = Dedup.minhashCandidates(nearDupDocs, k = 64, bands = 16, shingle = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 2L)), "exact dup pair must collide")
    assert(cand.contains((1L, 3L)) || cand.contains((1L, 5L)), "a near-dup pair must collide")
    assert(!cand.exists(p => p._1 == 4L || p._2 == 4L), "unrelated doc must not pair")
  }

  test("minhash signature estimates jaccard") {
    val a = "spark catalyst expression codegen pipeline"
    val b = "spark catalyst expression codegen pipelines"
    val sa = TextKernels.minhash(a, 256, 4)
    val sb = TextKernels.minhash(b, 256, 4)
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 256
    val (i, u) = TextKernels.shingleOverlap(a, b, 4)
    val exact = i.toDouble / u
    assert(math.abs(est - exact) < 0.15, s"est $est vs exact $exact")
  }

  test("simhash hamming distance is small for near-dups, large for unrelated") {
    val cand = Dedup.simhashCandidates(nearDupDocs, maxHamming = 12)
      .as[(Long, Long, Int)].collect()
    val m = cand.map(r => (r._1, r._2) -> r._3).toMap
    assert(m.get((1L, 2L)).contains(0), "identical docs → hamming 0")
    m.get((1L, 3L)).foreach(h => assert(h <= 12))
    val sh4 = TextKernels.simhash64(nearDupDocs.filter($"doc_id" === 4).as[(Long, String)].collect()(0)._2)
    val sh1 = TextKernels.simhash64(nearDupDocs.filter($"doc_id" === 1).as[(Long, String)].collect()(0)._2)
    assert(java.lang.Long.bitCount(sh1 ^ sh4) > 12, "unrelated docs far apart")
  }

  test("jaccard verify computes exact shingle overlap ratios") {
    val pairs = Seq((1L, 2L), (1L, 4L)).toDF("id_a", "id_b")
    val res = Dedup.jaccardVerify(pairs, nearDupDocs, shingle = 3)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(res((1L, 2L)) == 1.0)
    assert(res((1L, 4L)) < 0.2)
  }

  test("hashed jaccard verify equals the string path bit-for-bit") {
    // real corpus slice: every candidate pair from the LSH generator
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select($"doc_id", $"text").limit(400)
    val pairs = Dedup.minhashCandidates(docs, k = 64, bands = 16, shingle = 5)
      .select($"id_a", $"id_b")
    val viaText = Dedup.jaccardVerify(pairs, docs, shingle = 3)
      .select($"id_a", $"id_b", $"inter", $"uni").as[(Long, Long, Int, Int)]
      .collect().toSet
    val shingled = docs.select($"doc_id",
      graft.text.textfunctions.char_shingles($"text", 3).as("sh"))
    val viaHash = Dedup.jaccardVerifyHashed(pairs, shingled)
      .select($"id_a", $"id_b", $"inter", $"uni").as[(Long, Long, Int, Int)]
      .collect().toSet
    graft.pipeline.Caches.release()
    assert(viaText.nonEmpty && viaText == viaHash)
  }

  test("brute-force ANN topk: rank 1 is the vector itself") {
    val e = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5).select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val top = Ann.bruteTopK(q, c, 3).filter(col("rank") === 1)
      .select("q_id", "c_id").as[(Long, Long)].collect()
    // self-similarity maximal for normalized-ish embeddings; allow ties but expect mostly self
    assert(top.count(r => r._1 == r._2) >= 4)
  }

  test("LSH ANN recall >= 0.6 vs brute force at k=5") {
    val e = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20).select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val exact = Ann.bruteTopK(q, c, 5).select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val approx = Ann.lshTopK(q, c, 5, nBits = 16, bands = 8).select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("IVF with nprobe = #centroids reproduces brute force exactly") {
    val e = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val cents = graft.gen.Fixtures.centroidsFromNation(spark, TestSpark.Sf)
    val exact = Ann.bruteTopK(q, c, 5)
      .select("q_id", "c_id", "score", "rank").as[(Long, Long, Long, Int)].collect().toSet
    val full = Ann.ivfTopK(q, c, cents, nprobe = 25, k = 5)
      .select("q_id", "c_id", "score", "rank").as[(Long, Long, Long, Int)].collect().toSet
    assert(full == exact, "probing every list must equal brute force bit-for-bit")
  }

  test("IVF at nprobe = 3 keeps useful recall and never exceeds k") {
    val e = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20).select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val cents = graft.gen.Fixtures.centroidsFromNation(spark, TestSpark.Sf)
    val exact = Ann.bruteTopK(q, c, 5).select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val approx = Ann.ivfTopK(q, c, cents, nprobe = 3, k = 5)
      .select("q_id", "c_id").as[(Long, Long)].collect()
    assert(approx.groupBy(_._1).values.forall(_.length <= 5))
    val recall = (exact & approx.toSet).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall $recall — 3 of 25 arbitrary-grid lists must still find a fifth of true neighbors")
  }

  test("hot-bucket cap keeps a mass-duplicate corpus from going quadratic") {
    // 2000 identical docs + a distinct pair: uncapped, the identical docs
    // alone would emit ~2M candidate pairs; the cap drops their buckets
    val dup = (1L to 2000L).map(i => (i, "identical mass duplicated document body text"))
    val uniq = Seq((9001L, "a genuinely distinct document about raster tiles"),
      (9002L, "a genuinely distinct document about raster tiling"))
    val docs = (dup ++ uniq).toDF("doc_id", "text")
    val cand = Dedup.minhashCandidates(docs, k = 64, bands = 16, shingle = 5, maxBucket = 100)
    val n = cand.count()
    assert(n < 1000, s"capped candidate count $n must exclude the hot buckets")
    // the distinct near-dup pair still surfaces
    assert(cand.filter(col("id_a") === 9001L && col("id_b") === 9002L).count() == 1)
    // observability: the dropped buckets are countable
    val sig = docs.select(col("doc_id").as("id"),
      graft.text.textfunctions.minhash_sig(col("text"), 64, 5).as("sig"))
    val banded = sig.select(col("id"), posexplode(
      expr(s"transform(sequence(0, 15), b -> hash(slice(sig, b*4 + 1, 4)))")).as(Seq("band", "bkey")))
    assert(Dedup.hotBuckets(banded, 100).count() == 16, "every band has one mass bucket")
  }

  test("simhash chunk count controls the pigeonhole recall bound") {
    // two docs at hamming ~8: 4 chunks (bound 3) may miss, 11 chunks must hit
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq((1L, base), (2L, base + " lambda mu距")).toDF("doc_id", "text")
    val h = java.lang.Long.bitCount(
      TextKernels.simhash64(base) ^ TextKernels.simhash64(base + " lambda mu距"))
    val cand11 = Dedup.simhashCandidates(docs, maxHamming = math.max(h, 10), nChunks = math.max(h, 10) + 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cand11.contains((1L, 2L)), s"guaranteed recall at hamming $h with ${math.max(h, 10) + 1} chunks")
  }

  test("language id picks stopword-matching language") {
    assert(TextKernels.langId("the cat sat on the mat with the hat") == "en")
    assert(TextKernels.langId("der hund und die katze ist nicht da") == "de")
    assert(TextKernels.langId("el gato es una mascota en la casa") == "es")
    assert(TextKernels.langId("xyzzy plugh") == "und")
  }

  test("fingerprint is order-sensitive and deterministic") {
    val a = TextKernels.rollingFingerprint("abc def")
    assert(a == TextKernels.rollingFingerprint("abc def"))
    assert(a != TextKernels.rollingFingerprint("def abc"))
  }

  test("cosine near-dup equals the driver bucket+verify mirror bit-for-bit") {
    val e = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
    val got = Dedup.cosineNearDup(e, tau = 0.35, nBits = 16, bands = 4)
      .select("id_a", "id_b", "qdot").as[(Long, Long, Long)].collect().toSet
    // driver mirror of the whole operator: rademacher signature → band
    // buckets → candidate pairs → quantized-cosine verify with Spark's
    // round-on-double semantics (BigDecimal HALF_UP, not Math.round)
    val rows = e.select("vec_id", "embedding").as[(Long, Seq[Float])].collect().sortBy(_._1)
    def q(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    def qdot(a: Seq[Float], b: Seq[Float]): Long =
      a.zip(b).map { case (x, y) => q(x.toDouble * y.toDouble * 1048576L) }.sum
    val sigs = rows.map { case (id, v) =>
      id -> TextKernels.rademacherSig(v.map(_.toDouble).toArray, 16, 42L) }.toMap
    val norms = rows.map { case (id, v) => id -> qdot(v, v) }.toMap
    val tau2 = 0.35 * 0.35
    val expected = (for {
      (ia, va) <- rows; (ib, vb) <- rows if ia < ib
      if (0 until 4).exists(b => ((sigs(ia) >> (b * 4)) & 15L) == ((sigs(ib) >> (b * 4)) & 15L))
      d = qdot(va, vb)
      if d >= 0 && d.toDouble * d.toDouble >= (tau2 * norms(ia).toDouble) * norms(ib).toDouble
    } yield (ia, ib, d)).toSet
    assert(got == expected)
    assert(got.nonEmpty, "fixture must contain near-dup pairs at tau=0.35")
  }

  test("quantized_dot matches the interpreted HOF formulation bit-for-bit") {
    // adversarial inputs: negatives, zeros, denormal-ish tiny values,
    // magnitudes near the ±0.5 rounding boundaries at the 2^20 scale
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(500) { i =>
      val d = 1 + rnd.nextInt(64)
      val a = Array.fill(d)((rnd.nextGaussian() * (if (i % 5 == 0) 1e-7 else 1.0)).toFloat)
      val b = Array.fill(d)((rnd.nextGaussian() * (if (i % 7 == 0) 1e-4 else 1.0)).toFloat)
      (i.toLong, a.toSeq, b.toSeq)
    } :+ ((500L, Seq(0.5f, -0.5f, 1.0f), Seq(1e-6f, 1e-6f, -4.7683716e-7f)))
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(col("id"),
      graft.expr.functions.quantized_dot(col("a"), col("b")).as("fast"),
      expr("""aggregate(
        zip_with(a, b, (x, y) -> cast(round(cast(x as double) * cast(y as double) * 1048576) as bigint)),
        0L, (acc, v) -> acc + v)""").as("hof"))
    assert(cmp.filter(col("fast") =!= col("hof")).count() == 0)
    // and the SQL registration surface works
    df.createOrReplaceTempView("qd_probe")
    graft.expr.GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT sum(quantized_dot(a, b)) FROM qd_probe").head().getLong(0)
    val viaHof = cmp.agg(sum("hof")).head().getLong(0)
    assert(viaSql == viaHof)
  }

  test("int_dot matches the interpreted HOF over quantized arrays") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(200) { i =>
      val d = 1 + rnd.nextInt(64)
      (i.toLong,
        Seq.fill(d)(rnd.nextLong() % 1048576L),
        Seq.fill(d)(rnd.nextLong() % (1048576L * 512)))
    }
    val cmp = rows.toDF("id", "a", "b").select(
      graft.expr.functions.int_dot(col("a"), col("b")).as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("hof"))
    assert(cmp.filter(col("fast") =!= col("hof")).count() == 0)
  }

  test("cosine near-dup is partitioning-invariant and respects the hot-bucket cap") {
    val e = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
    val base = Dedup.cosineNearDup(e, tau = 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val repart = Dedup.cosineNearDup(e.repartition(7), tau = 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(base == repart)
    // an all-identical corpus lands in one bucket; the cap must drop it
    val dup = Seq.tabulate(200)(i => (i.toLong, Seq.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val capped = Dedup.cosineNearDup(dup, tau = 0.9, maxBucket = 50)
    assert(capped.count() == 0, "over-full buckets must not generate pairs")
  }

  test("semdedup drops planted duplicates to the min-id representative") {
    // two orthogonal directions; ids 0/1 seed the k=2 clusters. Exact
    // copies (cos = 1) must drop to the smallest id; the diagonal vectors
    // (cos = 1/sqrt(2) ≈ 0.707 to either axis) must survive tau = 0.9.
    def v(a: Float, b: Float, c: Float): Seq[Float] = Seq(a, b, c, 0f)
    val e = Seq(
      0L -> v(1, 0, 0), 1L -> v(0, 1, 0),
      2L -> v(1, 0, 0), 3L -> v(0, 1, 0),
      4L -> v(1, 0, 0), 5L -> v(0, 1, 0),
      6L -> v(1, 0, 1), 7L -> v(0, 1, 1)
    ).toDF("vec_id", "embedding")
    val got = Dedup.semDedup(e, k = 2, iters = 2, tau = 0.9)
      .select("vec_id", "dropped").as[(Long, Boolean)].collect().toMap
    assert(got.size == 8)
    assert(got.filter(_._2).keySet == Set(2L, 3L, 4L, 5L), s"got $got")
    // partitioning cannot change the result
    val repart = Dedup.semDedup(e.repartition(5), k = 2, iters = 2, tau = 0.9)
      .select("vec_id", "dropped").as[(Long, Boolean)].collect().toMap
    assert(repart == got)
  }
}
