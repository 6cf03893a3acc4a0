package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ear-clipping decomposition + the generalized (non-convex) overlay
  * family it unlocks in core.Clip. */
class TriangulateSpec extends AnyFunSuite {
  private val Eps = 1e-9

  private def lShape = Wkb.writePolygon(Array(Array(
    0.0, 0, 10, 0, 10, 4, 4, 4, 4, 10, 0, 10, 0, 0))) // area 10*4 + 4*6 = 64

  /** Random star-shaped simple polygon: JITTERED-UNIFORM angles (every
    * angular gap < π, so radial chords cannot cross — fully random
    * angles can leave a >π gap and self-intersect) with varying radius
    * (reflex vertices abound). */
  private def randomStar(rnd: scala.util.Random, cx: Double, cy: Double, rMax: Double): Array[Byte] = {
    val n = 5 + rnd.nextInt(8)
    val pts = Array.tabulate(n) { i =>
      val a = (i + 0.8 * rnd.nextDouble()) * 2 * math.Pi / n
      val r = rMax * (0.3 + 0.7 * rnd.nextDouble())
      (cx + r * math.cos(a), cy + r * math.sin(a))
    }
    Wkb.writePolygon(Array((pts :+ pts.head).flatMap(p => Array(p._1, p._2))))
  }

  test("triangulation preserves area and yields n-2 triangles") {
    val ring = Wkb.read(lShape).polygons(0).rings(0)
    val tris = Triangulate.earClip(ring)
    assert(tris.length == 6 - 2)
    assert(math.abs(tris.map(GeomOps.ringArea).sum - 64.0) < Eps)
    tris.foreach(t => assert(Clip.isConvexRing(t)))
    // random star polygons: area preserved, all triangles convex
    val rnd = new scala.util.Random(31)
    (1 to 100).foreach { _ =>
      val p = randomStar(rnd, 0, 0, 10)
      val r = Wkb.read(p).polygons(0).rings(0)
      val ts = Triangulate.earClip(r)
      assert(math.abs(ts.map(GeomOps.ringArea).sum - GeomOps.area(p)) < 1e-6)
      ts.foreach(t => assert(Clip.isConvexRing(t)))
    }
  }

  test("non-convex clip: intersection + difference partition the subject") {
    val subject = Wkb.writeBox(2, 2, 12, 12) // area 100
    val iArea = Clip.intersection(subject, lShape).map(GeomOps.area).getOrElse(0.0)
    val dArea = Clip.difference(subject, lShape).map(GeomOps.area).getOrElse(0.0)
    assert(math.abs(iArea + dArea - 100.0) < 1e-6)
    // closed form: box ∩ L = [2,10]×[2,4] plus [2,4]×[4,10] = 16 + 12
    assert(math.abs(iArea - 28.0) < 1e-6)
  }

  test("clip polygon with a hole works end-to-end") {
    val donut = Wkb.writePolygon(Array(
      Array(0.0, 0, 10, 0, 10, 10, 0, 10, 0, 0),
      Array(3.0, 3, 7, 3, 7, 7, 3, 7, 3, 3)))
    val subject = Wkb.writeBox(2, 2, 8, 8) // 36; donut covers 36 − hole 16 = 20
    val i = Clip.intersection(subject, donut).map(GeomOps.area).getOrElse(0.0)
    assert(math.abs(i - 20.0) < 1e-6)
    val d = Clip.difference(subject, donut).map(GeomOps.area).getOrElse(0.0)
    assert(math.abs(d - 16.0) < 1e-6)
  }

  test("union and dissolve accept concave inputs with exact additive area") {
    // L-shape ∪ box overlapping its notch
    val box = Wkb.writeBox(3, 3, 11, 11)
    val inter = Clip.intersection(box, lShape).map(GeomOps.area).getOrElse(0.0)
    val expect = 64.0 + 64.0 - inter
    assert(math.abs(Clip.unionArea(Seq(lShape, box)) - expect) < 1e-6)
    // random star pairs: |A∪B| = |A| + |B| − |A∩B|
    val rnd = new scala.util.Random(37)
    (1 to 60).foreach { _ =>
      val a = randomStar(rnd, 0, 0, 8)
      val b = randomStar(rnd, rnd.nextDouble() * 8 - 4, rnd.nextDouble() * 8 - 4, 8)
      val want = GeomOps.area(a) + GeomOps.area(b) -
        Clip.intersection(a, b).map(GeomOps.area).getOrElse(0.0)
      assert(math.abs(Clip.unionArea(Seq(a, b)) - want) < 1e-6)
    }
  }

  test("overlay identity holds for concave×concave pairs") {
    val rnd = new scala.util.Random(41)
    (1 to 60).foreach { i =>
      val a = randomStar(rnd, 0, 0, 10)
      val c = randomStar(rnd, rnd.nextDouble() * 6 - 3, rnd.nextDouble() * 6 - 3, 9)
      val aArea = GeomOps.area(a)
      val iA = Clip.intersection(a, c).map(GeomOps.area).getOrElse(0.0)
      val dA = Clip.difference(a, c).map(GeomOps.area).getOrElse(0.0)
      assert(math.abs(iA + dA - aArea) < 1e-6, s"iter $i")
    }
  }
}
