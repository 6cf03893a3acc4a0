package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Grid

/** linearTiled (per-tile Delaunay + ghost margins + locality certificate)
  * against the broadcast path: identical node set and BIT-identical
  * estimates on interior nodes, plus the >maxPoints distributed story. */
class GridTiledSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic NON-planar, irregular point layer over [0, 30)²:
  // jitter breaks the unit grid's cocircular degeneracy, the quadratic
  // value field makes estimates triangle-dependent (a plane would hide
  // wrong-triangle bugs)
  private def pointLayer(n: Int) = {
    (0 until n).flatMap { i =>
      (0 until n).map { j =>
        val lon = i * 0.5 + 0.01 * ((i * 7 + j * 13) % 5)
        val lat = j * 0.5 + 0.01 * ((i * 3 + j * 11) % 7)
        (i.toLong * n + j, lon, lat, lon * lon + 3.0 * lat)
      }
    }.toDF("p_id", "p_lon", "p_lat", "v")
  }

  private def targetLayer(n: Int) = {
    (5 until n - 5 by 3).flatMap { i =>
      (5 until n - 5 by 3).map { j =>
        (i.toLong * n + j, i * 0.5 + 0.13, j * 0.5 + 0.17)
      }
    }.toDF("t_id", "t_lon", "t_lat")
  }

  test("tiled path returns bit-identical estimates on interior nodes") {
    val pts = pointLayer(60)
    val tgt = targetLayer(60)
    val broad = Grid.linear(tgt, pts)
      .as[(Long, Double)].collect().toMap
    val tiled = Grid.linearTiled(tgt, pts, tileDeg = 5.0, marginDeg = 2.0)
      .as[(Long, Double)].collect().toMap
    // every interior node answered by the broadcast path is answered by
    // the tiled path (margin 2.0 >> the ~0.5 local circumradius bound)
    assert(broad.keySet == tiled.keySet)
    assert(broad.nonEmpty)
    broad.foreach { case (id, est) =>
      assert(java.lang.Double.doubleToLongBits(est) ==
        java.lang.Double.doubleToLongBits(tiled(id)), s"t_id=$id")
    }
  }

  test("a layer past the driver guard succeeds distributed") {
    val pts = pointLayer(40) // 1600 points
    val tgt = targetLayer(40)
    // broadcast path refuses (guard), tiled path answers
    val e = intercept[IllegalArgumentException] {
      Grid.linear(tgt, pts, maxPoints = 1000).count()
    }
    assert(e.getMessage.contains("maxPoints"))
    val tiled = Grid.linearTiled(tgt, pts, tileDeg = 5.0, marginDeg = 2.0)
    assert(tiled.count() > 0)
  }

  test("per-tile cap fails fast with a actionable message") {
    val pts = pointLayer(20)
    val tgt = targetLayer(20)
    val e = intercept[Exception] {
      Grid.linearTiled(tgt, pts, tileDeg = 100.0, marginDeg = 1.0, maxPerTile = 50).count()
    }
    assert(e.getMessage.contains("maxPerTile") || e.getCause != null)
  }
}
