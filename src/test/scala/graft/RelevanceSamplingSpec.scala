package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Sampling
import graft.text.{Relevance, TextKernels}

class RelevanceSamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark spark spark shuffle join"),
    (2L, "join join join join join"),
    (3L, "spark join"),
    (4L, "filter scan sort"),
    (5L, "spark shuffle")
  ).toDF("doc_id", "text")

  test("bm25 ranks rare-term-heavy docs first (log idf)") {
    val top = Relevance.bm25TopK(corpus, Seq("spark", "shuffle"), k = 5)
      .select("doc_id", "rank").as[(Long, Int)].collect().toMap
    // docs 1 and 5 contain both terms; doc 2 contains neither
    assert(top(1L) < top(3L) && top(5L) < top(3L))
    assert(top(2L) == 5 || top(4L) == 5 || top(2L) > top(1L))
    assert(Relevance.bm25TopK(corpus, Seq("spark"), k = 2).count() == 2)
  }

  test("bm25 rational variant matches a hand computation") {
    // corpus: N=5, dl = (5,5,2,3,2), S=17; term 'spark': tf=(3,0,1,0,1), df=3
    val row = Relevance.bm25TopK(corpus, Seq("spark"), k = 5, logIdf = false)
      .filter(col("doc_id") === 1L).select("score").as[Double].head()
    val n = 5L; val s = 17L; val df = 3L; val tf = 3L; val dl = 5L
    val idf = (2 * n - 2 * df + 1).toDouble / (2 * df + 1).toDouble
    val tfn = (22 * tf * s).toDouble / (10 * tf * s + 3 * s + 9 * dl * n).toDouble
    assert(row == idf * tfn)
  }

  test("bm25 zero-hit docs score exactly zero") {
    val scores = Relevance.bm25TopK(corpus, Seq("spark"), k = 5, logIdf = false)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(scores(2L) == 0.0 && scores(4L) == 0.0)
  }

  test("dsir scores match a hand replay and exclude the target slice") {
    val docs = Seq(
      (1L, "spark spark shuffle", "tgt"),
      (2L, "spark shuffle join", "tgt"),
      (3L, "spark spark spark", "raw"), // target-like -> should outrank 4
      (4L, "filter scan sort", "raw"),
      (5L, "spark scan", "raw")
    ).toDF("doc_id", "text", "source")
    val out = Relevance.dsirTopK(docs, col("source") === "tgt", k = 5)
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._1).toSet == Set(3L, 4L, 5L)) // raw pool only
    // hand replay: bucket counts over fnv&255, weight tc*R - rc*T
    val tokens = Seq(1L -> "spark spark shuffle", 2L -> "spark shuffle join",
      3L -> "spark spark spark", 4L -> "filter scan sort", 5L -> "spark scan")
      .flatMap { case (id, t) => t.split("\\s+").map(tok => (id, tok)) }
    val tgtIds = Set(1L, 2L)
    val byBucket = tokens.groupBy { case (_, tok) => TextKernels.fnv1a64(tok) & 255L }
    val tT = tokens.count { case (id, _) => tgtIds(id) }.toLong
    val tR = tokens.size - tT
    val w = byBucket.map { case (hb, ts) =>
      val tc = ts.count { case (id, _) => tgtIds(id) }.toLong
      val rc = ts.size - tc
      hb -> (tc * tR - rc * tT)
    }
    val expected = tokens.filterNot { case (id, _) => tgtIds(id) }
      .groupBy(_._1).map { case (id, ts) =>
        id -> ts.map { case (_, tok) => w(TextKernels.fnv1a64(tok) & 255L) }.sum }
    out.foreach { case (id, score, nToks) =>
      assert(score == expected(id), s"doc $id")
      assert(nToks == tokens.count { case (i, _) => i == id }.toLong)
    }
    // target-like raw doc outranks the unrelated one
    val rank = out.sortBy { case (id, s, _) => (-s, id) }.map(_._1)
    assert(rank.indexOf(3L) < rank.indexOf(4L))
  }

  test("sample buckets are deterministic and partition-invariant") {
    val ids = spark.range(0, 5000, 1, 7).select(col("id"))
    val a = Sampling.hashSample(ids, "id", 300000).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(ids.repartition(23), "id", 300000)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    // threshold sampling is NESTED: a lower rate is a subset of a higher one
    val small = Sampling.hashSample(ids, "id", 100000).select("id").as[Long].collect().toSet
    assert(small.subsetOf(a))
    // rate is honored within a loose binomial tolerance
    assert(math.abs(a.size / 5000.0 - 0.3) < 0.03)
    // kernel-level agreement
    assert(a.forall(i => TextKernels.sampleBucket(i) < 300000))
  }

  test("stratified rates apply per stratum; absent strata drop") {
    val df = spark.range(0, 3000).select(col("id"),
      when(col("id") % 3 === 0, "en").when(col("id") % 3 === 1, "fr").otherwise("xx").as("lang"))
    val out = Sampling.stratifiedSample(df, "id", "lang", Map("en" -> 1000000L, "fr" -> 0L))
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang.get("en").contains(1000L) && !byLang.contains("fr") && !byLang.contains("xx"))
  }

  test("stratifiedTopK returns exactly min(k, stratum size) per stratum") {
    val df = spark.range(0, 100).select(col("id"),
      when(col("id") < 90, "big").otherwise("small").as("grp"))
    val out = Sampling.stratifiedTopK(df, "id", "grp", k = 25)
    val counts = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts == Map("big" -> 25L, "small" -> 10L))
    // deterministic winner set: smallest buckets per group
    val winners = out.filter(col("grp") === "big").select("id").as[Long].collect().toSet
    val expect = (0L until 90L).sortBy(i => (TextKernels.sampleBucket(i), i)).take(25).toSet
    assert(winners == expect)
  }

  test("temperatureMix flattens the mixture toward sqrt quotas") {
    // 900 'big' vs 100 'small': natural shares 90/10; sqrt shares 75/25.
    val df = spark.range(0, 1000).select(col("id"),
      when(col("id") < 900, "big").otherwise("small").as("grp"))
    val out = Sampling.temperatureMix(df, "id", "grp", total = 200L)
    val counts = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    // exact quotas: s_big = floor(30*2^20) , s_small = floor(10*2^20);
    // quota_big = 200*3/4 = 150, quota_small = 200/4 = 50
    assert(counts == Map("big" -> 150L, "small" -> 50L))
    // deterministic and partitioning-invariant
    val again = Sampling.temperatureMix(df.repartition(7), "id", "grp", total = 200L)
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
    // a quota above the stratum size keeps the whole stratum
    val tiny = spark.range(0, 10).select(col("id"), lit("only").as("grp"))
    assert(Sampling.temperatureMix(tiny, "id", "grp", total = 100L).count() == 10L)
  }

  test("epochShuffle: per-epoch permutations, contiguous shard positions, deterministic") {
    val df = spark.range(0, 500).toDF("id")
    val out = Sampling.epochShuffle(df, "id", epochs = 2, shards = 4).cache()
    // every epoch covers all ids exactly once
    assert(out.groupBy("epoch").count().as[(Int, Long)].collect().toMap ==
      Map(0 -> 500L, 1 -> 500L))
    // positions are 1..n within each (epoch, shard)
    val bad = out.groupBy("epoch", "shard")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"), min(col("pos")).as("mn"),
        countDistinct(col("pos")).as("d"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("d") =!= col("n"))
    assert(bad.count() == 0L)
    // epochs produce DIFFERENT orders: some id changes (shard, pos)
    val changed = out.filter(col("epoch") === 0).as("a")
      .join(out.filter(col("epoch") === 1).as("b"), col("a.id") === col("b.id"))
      .filter(col("a.shard") =!= col("b.shard") || col("a.pos") =!= col("b.pos"))
    assert(changed.count() > 400L)
    // deterministic under repartitioning
    val again = Sampling.epochShuffle(df.repartition(11), "id", epochs = 2, shards = 4)
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(again == out.as[(Long, Int, Int, Int)].collect().toSet)
    out.unpersist()
    // non-power-of-two shard counts are rejected (unsigned-residue contract)
    intercept[IllegalArgumentException] {
      Sampling.epochShuffle(df, "id", epochs = 1, shards = 6)
    }
  }

  test("leakageSplit is component-atomic, deterministic, and leak-free") {
    // 200 ids in 60 components of mixed sizes (component = id - id%k style)
    val assign = spark.range(0, 200).select(col("id"),
      (col("id") - pmod(col("id"), (pmod(col("id"), lit(5L)) + 1L))).as("component"))
    val out = Sampling.leakageSplit(assign, valPermille = 300L, salt = 7L)
    // component-atomic: no component appears under both splits
    assert(out.groupBy("component").agg(countDistinct("split").as("k"))
      .filter(col("k") > 1).count() == 0L)
    // both splits non-empty at 30% val over 60+ components
    val sizes = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(sizes.keySet == Set("train", "val") && sizes.values.forall(_ > 0))
    // deterministic under repartitioning
    val again = Sampling.leakageSplit(assign.repartition(13), valPermille = 300L, salt = 7L)
      .select("id", "split").as[(Long, String)].collect().toSet
    assert(again == out.select("id", "split").as[(Long, String)].collect().toSet)
    // within-component edges (the only edges a dedup graph emits after
    // components) never cross the cut
    val edges = assign.select(col("id").as("a"), col("component").as("c"))
      .join(assign.select(col("id").as("b"), col("component").as("c")), "c")
      .filter(col("a") < col("b"))
    val leak = edges.join(out.select(col("id").as("a"), col("split").as("sa")), "a")
      .join(out.select(col("id").as("b"), col("split").as("sb")), "b")
      .filter(col("sa") =!= col("sb")).count()
    assert(leak == 0L)
  }

  test("spatialSplit: buffered, cell-atomic, data-aware, partition-invariant") {
    // deterministic lon/lat scatter dense enough for adjacency at level 5
    val pts = spark.range(0, 3000).select(col("id"),
      ((pmod(col("id") * 97L, lit(3600L))).cast("double") / 10.0 - 180.0).as("lon"),
      ((pmod(col("id") * 61L, lit(1700L))).cast("double") / 10.0 - 85.0).as("lat"))
    val out = Sampling.spatialSplit(pts, "lon", "lat", level = 5,
      valPermille = 150L, salt = 3L)
      .select(col("id"), col("cell"), col("split"))
      .as[(Long, Long, String)].collect()
    graft.pipeline.Caches.release()
    assert(out.map(_._3).toSet == Set("train", "val", "excluded"))
    // cell-atomic: one split per cell
    assert(out.groupBy(_._2).forall(_._2.map(_._3).distinct.length == 1))
    // buffered: no TRAIN cell is Chebyshev-adjacent to a val-DATA cell
    val valCells = out.filter(_._3 == "val").map(_._2).distinct.toSet
    val bufferZone = valCells.flatMap(c => graft.core.CellIndex.block(c, 1))
    val trainCells = out.filter(_._3 == "train").map(_._2).distinct.toSet
    assert(trainCells.intersect(bufferZone).isEmpty)
    // excluded = exactly the train-hash cells inside the data buffer zone
    val exCells = out.filter(_._3 == "excluded").map(_._2).distinct.toSet
    assert(exCells.subsetOf(bufferZone) && exCells.intersect(valCells).isEmpty)
    // deterministic under repartitioning
    val again = Sampling.spatialSplit(pts.repartition(13), "lon", "lat", level = 5,
      valPermille = 150L, salt = 3L)
      .select(col("id"), col("split")).as[(Long, String)].collect().toSet
    graft.pipeline.Caches.release()
    assert(again == out.map(t => (t._1, t._3)).toSet)
  }
}
