package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Quantiles

/** Exact quantile profile (q167): brute-force parity + partitioning
  * invariance + boundary conventions. */
class QuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(vs: Seq[Int], q: Int): Int = {
    val sorted = vs.sorted
    // min v with |{rows <= v}| >= ceil(q*n/100)
    val rank = (q * vs.length + 99) / 100
    sorted(rank - 1)
  }

  test("profile matches the sorted-rank definition on skewed data") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      // heavy ties + skew: values in a small domain with a hot value
      val v = if (rnd.nextInt(10) == 0) 7 else rnd.nextInt(200)
      (g, v)
    }
    val df = rows.toDF("g", "v")
    val got = Quantiles.profile(df, "g", "v", Seq(25, 50, 75, 99))
      .collect().map(r => r.getString(0) -> r).toMap
    Seq("a", "b").foreach { g =>
      val vs = rows.filter(_._1 == g).map(_._2)
      val r = got(g)
      assert(r.getAs[Long]("n") == vs.length)
      Seq(25, 50, 75, 99).foreach { q =>
        assert(r.getAs[Int](s"p$q") == brute(vs, q), s"g=$g p$q")
      }
    }
  }

  test("partitioning invariance and p100-boundary behavior") {
    val rows = (1 to 997).map(i => ("x", i))
    val a = Quantiles.profile(rows.toDF("g", "v").repartition(1), "g", "v", Seq(1, 50, 100))
      .collect()(0)
    val b = Quantiles.profile(rows.toDF("g", "v").repartition(17), "g", "v", Seq(1, 50, 100))
      .collect()(0)
    assert(a.toSeq == b.toSeq)
    assert(a.getAs[Int]("p1") == brute(rows.map(_._2), 1))
    assert(a.getAs[Int]("p100") == 997, "p100 is the max")
  }

  test("null group key is kept as its own group; null values are excluded from n and p-values") {
    val df = Seq[(Option[String], Option[Int])](
      (Some("a"), Some(1)), (Some("a"), Some(2)), (Some("a"), None),
      (None, Some(10)), (None, Some(20)), (None, None))
      .toDF("g", "v")
    val got = Quantiles.profile(df, "g", "v", Seq(50, 100))
      .collect().map(r => Option(r.getString(0)) -> r).toMap
    assert(got.contains(None), "null-key stratum must not be dropped by the totals join")
    assert(got(None).getAs[Long]("n") == 2, "null values excluded from n")
    assert(got(None).getAs[Int]("p50") == 10 && got(None).getAs[Int]("p100") == 20)
    assert(got(Some("a")).getAs[Long]("n") == 2 && got(Some("a")).getAs[Int]("p50") == 1)
  }

  override def withFixture(test: NoArgTest): org.scalatest.Outcome =
    try super.withFixture(test)
    finally graft.pipeline.Caches.release() // profile() persists its histogram
}
