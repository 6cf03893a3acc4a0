package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Delaunay (Bowyer–Watson) kernel + Grid.linear (GGA_Linear,
  * alg/gdal_alg.h:402): empty-circumcircle validity, Euler triangle
  * counts, plane reproduction on the q88 fixture, and hull-exterior
  * no-data semantics. */
class DelaunaySpec extends AnyFunSuite {

  private def circumOk(xs: Array[Double], ys: Array[Double], tri: Delaunay.Tri): Unit = {
    val n = xs.length
    var t = 0
    while (t < tri.count) {
      val a = tri.tris(3 * t); val b = tri.tris(3 * t + 1); val c = tri.tris(3 * t + 2)
      // circumcenter via perpendicular bisector intersection
      val d = 2 * (xs(a) * (ys(b) - ys(c)) + xs(b) * (ys(c) - ys(a)) + xs(c) * (ys(a) - ys(b)))
      assert(math.abs(d) > 1e-12, s"degenerate triangle $t")
      val ux = ((xs(a) * xs(a) + ys(a) * ys(a)) * (ys(b) - ys(c)) +
        (xs(b) * xs(b) + ys(b) * ys(b)) * (ys(c) - ys(a)) +
        (xs(c) * xs(c) + ys(c) * ys(c)) * (ys(a) - ys(b))) / d
      val uy = ((xs(a) * xs(a) + ys(a) * ys(a)) * (xs(c) - xs(b)) +
        (xs(b) * xs(b) + ys(b) * ys(b)) * (xs(a) - xs(c)) +
        (xs(c) * xs(c) + ys(c) * ys(c)) * (xs(b) - xs(a))) / d
      val r2 = (xs(a) - ux) * (xs(a) - ux) + (ys(a) - uy) * (ys(a) - uy)
      var p = 0
      while (p < n) {
        if (p != a && p != b && p != c) {
          val d2 = (xs(p) - ux) * (xs(p) - ux) + (ys(p) - uy) * (ys(p) - uy)
          assert(d2 >= r2 * (1 - 1e-9),
            s"point $p strictly inside circumcircle of triangle $t ($d2 < $r2)")
        }
        p += 1
      }
      t += 1
    }
  }

  test("random point set: Delaunay-valid, Euler count, full hull coverage") {
    val rnd = new scala.util.Random(42)
    val n = 300
    val xs = Array.fill(n)(rnd.nextDouble() * 100)
    val ys = Array.fill(n)(rnd.nextDouble() * 100)
    val tri = Delaunay.triangulate(xs, ys)
    circumOk(xs, ys, tri)
    // Euler: T = 2n - 2 - h (h = hull vertex count, general position)
    val sortedPts = xs.indices.map(i => (xs(i), ys(i))).sorted.toArray
    @inline def cr(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def chain(ps: Iterator[(Double, Double)]): Vector[(Double, Double)] =
      ps.foldLeft(Vector.empty[(Double, Double)]) { (acc0, p) =>
        var acc = acc0
        while (acc.length >= 2 && cr(acc(acc.length - 2), acc.last, p) <= 0) acc = acc.dropRight(1)
        acc :+ p
      }
    val hull = (chain(sortedPts.iterator).dropRight(1) ++
      chain(sortedPts.reverseIterator).dropRight(1)).toArray
    val h = hull.length
    assert(tri.count == 2 * n - 2 - h, s"T=${tri.count}, expected ${2 * n - 2 - h} (h=$h)")
    // total triangle area == hull area (covers the hull, no overlap/holes)
    var area2 = 0.0
    for (t <- 0 until tri.count) {
      val a = tri.tris(3 * t); val b = tri.tris(3 * t + 1); val c = tri.tris(3 * t + 2)
      area2 += math.abs((xs(b) - xs(a)) * (ys(c) - ys(a)) - (xs(c) - xs(a)) * (ys(b) - ys(a)))
    }
    var hullArea2 = 0.0
    for (i <- 0 until h) {
      val j = (i + 1) % h
      hullArea2 += hull(i)._1 * hull(j)._2 - hull(j)._1 * hull(i)._2
    }
    assert(math.abs(area2 - math.abs(hullArea2)) < 1e-6 * math.abs(hullArea2))
  }

  test("q88 fixture grid: collinear hull edges, plane reproduced at interior probes") {
    // mirror gen.Fixtures.planeGridPoints exactly (i,j in 0..24)
    val pts = for (i <- 0 until 25; j <- 0 until 25) yield {
      val jx = if (i > 0 && i < 24) (((i * 7 + j * 13) % 8) - 4) / 16.0 else 0.0
      val jy = if (j > 0 && j < 24) (((i * 11 + j * 5) % 8) - 4) / 16.0 else 0.0
      (i + jx, j + jy)
    }
    val xs = pts.map(_._1).toArray
    val ys = pts.map(_._2).toArray
    val vs = xs.indices.map(k => 3.0 * xs(k) + 7.0 * ys(k) + 10.0).toArray
    val tri = Delaunay.triangulate(xs, ys)
    // Euler with 96 hull-boundary vertices (all rectangle-edge points)
    assert(tri.count == 2 * 625 - 2 - 96, s"T=${tri.count}")
    circumOk(xs, ys, tri)

    val envs = Array.tabulate(tri.count) { t =>
      val a = tri.tris(3 * t); val b = tri.tris(3 * t + 1); val c = tri.tris(3 * t + 2)
      (math.min(xs(a), math.min(xs(b), xs(c))), math.min(ys(a), math.min(ys(b), ys(c))),
        math.max(xs(a), math.max(xs(b), xs(c))), math.max(ys(a), math.max(ys(b), ys(c))))
    }
    val tree = StrTree.build(envs)
    def interp(qx: Double, qy: Double): Option[Double] = {
      val hits = tree.query(qx, qy, qx, qy)
      hits.iterator.map { t =>
        val a = tri.tris(3 * t); val b = tri.tris(3 * t + 1); val c = tri.tris(3 * t + 2)
        val w = Delaunay.barycentric(xs(a), ys(a), xs(b), ys(b), xs(c), ys(c), qx, qy)
        if (w == null) None else Some(w(0) * vs(a) + w(1) * vs(b) + w(2) * vs(c))
      }.collectFirst { case Some(v) => v }
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 500) {
      val qx = 0.3 + rnd.nextDouble() * 23.0
      val qy = 0.3 + rnd.nextDouble() * 23.0
      val est = interp(qx, qy)
      assert(est.isDefined, s"no triangle at ($qx,$qy)")
      assert(math.abs(est.get - (3 * qx + 7 * qy + 10)) < 1e-9,
        s"plane mismatch at ($qx,$qy): ${est.get}")
    }
    // outside the hull: no-data (reference GGA_Linear nodata branch)
    assert(interp(-0.5, 12.0).isEmpty && interp(12.0, 24.5).isEmpty)
  }

  test("Grid.linear on Spark: plane targets, exterior targets dropped") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val points = graft.gen.Fixtures.planeGridPoints(spark, graft.TestSpark.Sf)
    val inTgts = Seq((1L, 5.17, 9.83), (2L, 0.31, 23.29), (3L, 22.9, 0.4))
      .toDF("t_id", "t_lon", "t_lat")
    val outTgts = Seq((4L, -3.0, 5.0), (5L, 25.0, 25.0)).toDF("t_id", "t_lon", "t_lat")
    val got = graft.ops.Grid.linear(inTgts.union(outTgts), points)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L), s"exterior targets not dropped: ${got.keySet}")
    for ((id, lon, lat) <- Seq((1L, 5.17, 9.83), (2L, 0.31, 23.29), (3L, 22.9, 0.4)))
      assert(math.abs(got(id) - (3 * lon + 7 * lat + 10)) < 1e-9, s"t_id=$id: ${got(id)}")
  }

  test("50k random points triangulate quickly and validly (spot-checked)") {
    val rnd = new scala.util.Random(1234)
    val n = 50000
    val xs = Array.fill(n)(rnd.nextDouble() * 1000)
    val ys = Array.fill(n)(rnd.nextDouble() * 1000)
    val t0 = System.nanoTime()
    val tri = Delaunay.triangulate(xs, ys)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(tri.count > 2 * n - 2 - 200 && tri.count < 2 * n, s"T=${tri.count}")
    assert(secs < 30, s"triangulation took $secs s — walk is not localized")
    // spot-check empty-circumcircle on a sample of triangles vs a point sample
    val sampleT = (0 until 200).map(_ => rnd.nextInt(tri.count))
    val sampleP = (0 until 500).map(_ => rnd.nextInt(n))
    for (t <- sampleT) {
      val a = tri.tris(3 * t); val b = tri.tris(3 * t + 1); val c = tri.tris(3 * t + 2)
      val d = 2 * (xs(a) * (ys(b) - ys(c)) + xs(b) * (ys(c) - ys(a)) + xs(c) * (ys(a) - ys(b)))
      if (math.abs(d) > 1e-9) {
        val ux = ((xs(a) * xs(a) + ys(a) * ys(a)) * (ys(b) - ys(c)) +
          (xs(b) * xs(b) + ys(b) * ys(b)) * (ys(c) - ys(a)) +
          (xs(c) * xs(c) + ys(c) * ys(c)) * (ys(a) - ys(b))) / d
        val uy = ((xs(a) * xs(a) + ys(a) * ys(a)) * (xs(c) - xs(b)) +
          (xs(b) * xs(b) + ys(b) * ys(b)) * (xs(a) - xs(c)) +
          (xs(c) * xs(c) + ys(c) * ys(c)) * (xs(b) - xs(a))) / d
        val r2 = (xs(a) - ux) * (xs(a) - ux) + (ys(a) - uy) * (ys(a) - uy)
        for (p <- sampleP if p != a && p != b && p != c) {
          val d2 = (xs(p) - ux) * (xs(p) - ux) + (ys(p) - uy) * (ys(p) - uy)
          assert(d2 >= r2 * (1 - 1e-9), s"point $p inside circumcircle of $t")
        }
      }
    }
  }
}
