package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Cms
import graft.text.TextKernels

/** Count-Min sketch (q168): matrix parity with a driver-side reference,
  * partitioning invariance, and the est ≥ true overcount bound. */
class CmsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val D = 4; private val W = 256

  private def refMatrix(xs: Seq[Long]): Array[Long] = {
    val m = new Array[Long](D * W)
    xs.foreach { x =>
      (0 until D).foreach { r =>
        val b = (TextKernels.splitmix64(x + r * Cms.Golden) & (W - 1)).toInt
        m(r * W + b) += 1
      }
    }
    m
  }

  private val xs: Seq[Long] = {
    val rnd = new scala.util.Random(11)
    // zipfish: hot item 9999 at ~20% mass plus a long tail
    (1 to 30000).map(_ => if (rnd.nextInt(5) == 0) 9999L else rnd.nextInt(4000).toLong)
  }

  test("matrix matches the driver-side reference; partitioning-invariant") {
    val df = xs.toDF("x")
    val a = Cms.sketch(df.repartition(1), Nil, "x", D, W)
      .collect()(0).getAs[scala.collection.Seq[Long]]("m").toSeq
    val b = Cms.sketch(df.repartition(13), Nil, "x", D, W)
      .collect()(0).getAs[scala.collection.Seq[Long]]("m").toSeq
    assert(a == refMatrix(xs).toSeq)
    assert(a == b)
  }

  test("point estimates: est >= true for every item, overcount bounded by the CMS guarantee") {
    val m = refMatrix(xs)
    val got = Cms.sketch(xs.toDF("x"), Nil, "x", D, W)
    val probes = xs.distinct.toDF("x")
    val ests = probes.crossJoin(got)
      .withColumn("est", Cms.estimate(col("m"), col("x"), D, W))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("est")).toMap
    val trueCnt = xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    trueCnt.foreach { case (x, n) =>
      assert(ests(x) >= n, s"CMS must never undercount (x=$x)")
    }
    // CMS bound: overcount <= e*N/w with prob 1-e^-d per item; allow a
    // generous 3N/w on the hot item (observed ~73 on N=30000, w=256)
    assert(ests(9999L) - trueCnt(9999L) <= 3L * xs.length / W,
      s"hot item est=${ests(9999L)} true=${trueCnt(9999L)}")
    // the driver-side estimate definition matches the column expression
    xs.distinct.take(50).foreach { x =>
      val expect = (0 until D).map { r =>
        m(r * W + (TextKernels.splitmix64(x + r * Cms.Golden) & (W - 1)).toInt)
      }.min
      assert(ests(x) == expect)
    }
  }
}
