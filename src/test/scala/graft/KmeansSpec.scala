package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expr.PqKernels
import graft.ops.Kmeans

/** Lloyd's trainer vs an independent driver-side reference implementation
  * (plain Scala over the same quantized int64 algebra), plus the
  * empty-cluster and own-centroid edge cases. */
class KmeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Scale = graft.expr.AnnKernels.Scale

  /** Deterministic pseudo-random float vectors (dyadic components). */
  private def vecs(n: Int, d: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { id =>
      (id.toLong, Array.tabulate(d)(i => (((id * 31 + i * 17) % 64) - 32) / 32.0f))
    }

  /** Reference Lloyd's: same quantization, argmin, floorDiv update. */
  private def refFit(pts: Seq[(Long, Array[Float])], k: Int, iters: Int)
      : (Array[Array[Long]], Map[Int, (Long, Long, Long)]) = {
    val q = pts.sortBy(_._1).map { case (id, v) =>
      (id, v.map(x => PqKernels.qround(x.toDouble * Scale)))
    }
    val d = q.head._2.length
    var cents = q.take(k).map(_._2.clone()).toArray
    var last: Map[Int, (Long, Long, Long)] = Map.empty // cell -> (n, qxSum, score)
    for (_ <- 1 to iters) {
      val assigned = q.map { case (_, x) =>
        val ds = cents.map { c =>
          var dot = 0L; var qn = 0L; var i = 0
          while (i < d) { dot += x(i) * c(i); qn += c(i) * c(i); i += 1 }
          qn - 2L * dot
        }
        val j = ds.indices.minBy(j => (ds(j), j))
        (j, x, ds(j))
      }
      last = assigned.groupBy(_._1).map { case (j, g) =>
        j -> (g.size.toLong, g.map(_._2.sum).sum, g.map(_._3).sum)
      }
      val next = cents.map(_.clone())
      assigned.groupBy(_._1).foreach { case (j, g) =>
        next(j) = Array.tabulate(d)(i => Math.floorDiv(g.map(_._2(i)).sum, g.size.toLong))
      }
      cents = next
    }
    (cents, last)
  }

  test("fit matches the driver-side reference bit-for-bit") {
    val pts = vecs(60, 16)
    val df = pts.toDF("p_id", "emb")
    val fit = Kmeans.fit(df, "p_id", "emb", k = 4, iters = 3)
    val (refCents, refSummary) = refFit(pts, k = 4, iters = 3)

    assert(fit.model.cents.map(_.toSeq).toSeq == refCents.map(_.toSeq).toSeq)
    val got = fit.summary.collect().map(r =>
      r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == refSummary.keySet)
    got.foreach { case (j, (n, qxSum, score, qcSum)) =>
      val (rn, rqx, rscore) = refSummary(j)
      assert(n == rn && qxSum == rqx && score == rscore, s"cluster $j mismatch")
      assert(qcSum == refCents(j).sum, s"cluster $j centroid sum mismatch")
    }
  }

  test("k = n, one iteration: every point is its own centroid") {
    val pts = vecs(8, 8)
    val fit = Kmeans.fit(pts.toDF("p_id", "emb"), "p_id", "emb", k = 8, iters = 1)
    val rows = fit.summary.collect()
    assert(rows.length == 8)
    rows.foreach(r => assert(r.getLong(1) == 1L, "singleton clusters"))
    // the post-update centroid of a singleton is the point itself
    val q = pts.map { case (id, v) => id -> v.map(x => PqKernels.qround(x.toDouble * Scale)) }.toMap
    fit.model.cents.zipWithIndex.foreach { case (c, j) =>
      assert(c.toSeq == q(j.toLong).toSeq)
    }
  }

  test("a cluster that loses all members keeps its centroid") {
    // two tight groups far apart seed centroids 0 and 1; centroid 2 seeds
    // inside group A and is strictly dominated after round 1's update
    // pulls centroid 0 onto A's mean — rounds 2+ leave it memberless.
    val a = (0 until 2).map(i => (i.toLong, Array(0.01f * i, 0f)))
    val b = (2 until 4).map(i => (i.toLong, Array(0.9f, 0.9f + 0.01f * (i - 2))))
    val far = Seq((4L, Array(0.005f, 0.001f)), (5L, Array(0.012f, 0.002f)))
    val pts = a ++ b ++ far
    val fit = Kmeans.fit(pts.toDF("p_id", "emb"), "p_id", "emb", k = 3, iters = 4)
    val (refCents, _) = refFit(pts, k = 3, iters = 4)
    assert(fit.model.cents.map(_.toSeq).toSeq == refCents.map(_.toSeq).toSeq)
  }
}
