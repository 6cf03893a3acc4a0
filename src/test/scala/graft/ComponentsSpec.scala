package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Components, Dedup}

class ComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Local union-find oracle. */
  private def ufComponents(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def run(n: Int, edges: Seq[(Long, Long)],
                  maxLocalEdges: Long = 500000): Map[Long, Long] = {
    val e = if (edges.isEmpty) Seq((-1L, -1L)).toDF("a", "b").filter(col("a") > 0)
            else edges.toDF("a", "b")
    val nodes = (0L until n.toLong).toDF("id")
    Components.connectedComponents(e, "a", "b", nodes, maxLocalEdges = maxLocalEdges)
      .as[(Long, Long)].collect().toMap
  }

  test("matches union-find on a random graph") {
    val rnd = new scala.util.Random(7)
    val n = 400
    val edges = Seq.fill(300)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(p => p._1 != p._2)
    assert(run(n, edges) == ufComponents(n, edges))
  }

  test("fully distributed loop (maxLocalEdges=0) equals the local finish") {
    val rnd = new scala.util.Random(11)
    val n = 300
    val edges = Seq.fill(220)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(p => p._1 != p._2)
    val expected = ufComponents(n, edges)
    assert(run(n, edges, maxLocalEdges = 0) == expected)
    assert(run(n, edges) == expected)
  }

  test("long path converges (log-round, diameter-independent)") {
    val n = 1024
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)) // diameter n
    val got = run(n, edges, maxLocalEdges = 0) // force the distributed loop
    assert(got.values.toSet == Set(0L) && got.size == n)
  }

  test("singletons, self-loops and duplicate/reversed edges") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 2L), (1L, 2L), (5L, 6L))
    val got = run(8, edges)
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("empty edge set yields all-singleton components") {
    val got = run(5, Seq.empty)
    assert(got == (0L until 5L).map(i => i -> i).toMap)
  }

  test("two dense clusters stay separate") {
    val a = for (i <- 0 until 10; j <- i + 1 until 10) yield (i.toLong, j.toLong)
    val b = for (i <- 10 until 20; j <- i + 1 until 20) yield (i.toLong, j.toLong)
    val got = run(20, a ++ b)
    assert((0 until 10).forall(i => got(i.toLong) == 0L))
    assert((10 until 20).forall(i => got(i.toLong) == 10L))
  }

  test("q114 rep-graph factorization equals brute-force full-graph union-find at sf0.001") {
    // The q114/q152 DuckDB oracles propagate over the REPRESENTATIVE
    // (distinct-phash) graph and expand through each image's hash rep —
    // this spec is what pins that factorization against the FULL
    // per-image pair graph (every key pair at Hamming <= 3, including the
    // distance-0 mass-duplicate cliques), which the oracle no longer
    // enumerates (it is quadratic in duplicate-cluster size).
    val imgs = graft.gen.Fixtures.imagesFromParts(spark, TestSpark.Sf)
      .select(col("key"), col("phash")).as[(Long, Long)].collect()
    val keys = imgs.map(_._1)
    val idx = keys.zipWithIndex.toMap
    val full = for {
      i <- imgs.indices; j <- (i + 1) until imgs.length
      if java.lang.Long.bitCount(imgs(i)._2 ^ imgs(j)._2) <= 3
    } yield (imgs(i)._1, imgs(j)._1)
    // union-find over dense local indices, then min-KEY label per root
    val parent = Array.tabulate(imgs.length)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }; r }
    full.foreach { case (a, b) =>
      val (ra, rb) = (find(idx(a)), find(idx(b)))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val minKey = scala.collection.mutable.Map[Int, Long]()
    imgs.indices.foreach { i =>
      val r = find(i)
      minKey(r) = math.min(minKey.getOrElse(r, Long.MaxValue), keys(i))
    }
    val expected = imgs.indices.map(i => keys(i) -> minKey(find(i))).toMap
    val got = graft.SparkEntry.queries("q114_phash_clusters")(spark, TestSpark.Sf)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("hamming near-dup pairs have perfect recall within the pigeonhole bound") {
    // hand-built hashes: 10/11 differ by ≤3 bits from 0x0F0F...; 12 is far
    val rows = Seq(
      (10L, 0x0F0F0F0F0F0F0F0FL),
      (11L, 0x0F0F0F0F0F0F0F0CL),            // hamming 2 from 10
      (12L, 0x30F0F0F0F0F0F0F0L),            // far from both
      (13L, 0x0F0F0F0F0F0F0F0FL)             // exact dup of 10
    ).toDF("id", "h")
    val pairs = Dedup.hammingNearDup(rows, "h", "id", maxHamming = 3, nChunks = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((10L, 11L, 2), (11L, 13L, 2), (10L, 13L, 0)))
  }
}
