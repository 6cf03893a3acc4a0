package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** MakeValid (even-odd linework rebuild) against closed-form areas; see
  * core/MakeValid.scala for the semantics being pinned. */
class MakeValidSpec extends AnyFunSuite {

  private def area(wkb: Array[Byte]): Double =
    Wkb.read(wkb).polygons.map(p => GeomOps.ringArea(p.rings(0))).sum

  test("valid polygon (incl. hole) passes through byte-identical") {
    val box = Wkb.writeBox(1, 2, 7, 9)
    assert(MakeValid.makeValid(box).get.sameElements(box))
    val holed = Wkb.writePolygon(Array(
      Array(0.0, 0, 10, 0, 10, 10, 0, 10, 0, 0),
      Array(2.0, 2, 2, 5, 5, 5, 5, 2, 2, 2)))
    assert(MakeValid.makeValid(holed).get.sameElements(holed))
    val g = Wkb.read(holed)
    assert(MakeValid.isValidPolygonal(g))
  }

  test("bowtie repairs to two lobes of total area w*h/2") {
    // self-crossing ring over box [0,w]x[0,h]: lobes are two triangles
    val w = 8.0; val h = 6.0
    val bow = Wkb.writePolygon(Array(Array(0.0, 0, w, h, w, 0, 0.0, h, 0.0, 0)))
    assert(!MakeValid.isValidPolygonal(Wkb.read(bow)))
    val fixed = MakeValid.makeValid(bow).get
    assert(math.abs(area(fixed) - w * h / 2) < 1e-9)
    assert(MakeValid.isValidPolygonal(Wkb.read(fixed)))
    // pieces are disjoint: quantized shoelace equals the additive sum
    val parts = Wkb.read(fixed).polygons
    assert(parts.length >= 2)
  }

  test("hole escaping the shell: even-odd keeps shell-hole + escaped part") {
    val shell = Array(0.0, 0, 4, 0, 4, 4, 0, 4, 0, 0)
    val hole = Array(2.0, 1, 6, 1, 6, 3, 2, 3, 2, 1) // escapes right
    val bad = Wkb.writePolygon(Array(shell, hole))
    assert(!MakeValid.isValidPolygonal(Wkb.read(bad)))
    val fixed = MakeValid.makeValid(bad).get
    // shell(16) − overlap(4) + escaped hole area(4) = 16
    assert(math.abs(area(fixed) - 16.0) < 1e-9)
  }

  test("duplicate consecutive vertex is invalid and repairs area-preserving") {
    val dup = Wkb.writePolygon(Array(Array(0.0, 0, 5, 0, 5, 0, 5, 5, 0, 5, 0, 0)))
    assert(!MakeValid.isValidPolygonal(Wkb.read(dup)))
    val fixed = MakeValid.makeValid(dup).get
    assert(math.abs(area(fixed) - 25.0) < 1e-9)
  }

  test("multipolygon with properly-overlapping parts unions per-element") {
    val mp = Wkb.writeMultiPolygon(Array(
      Array(Array(0.0, 0, 2, 0, 2, 2, 0, 2, 0, 0)),
      Array(Array(1.0, 1, 3, 1, 3, 3, 1, 3, 1, 1))))
    assert(!MakeValid.isValidPolygonal(Wkb.read(mp)))
    val fixed = MakeValid.makeValid(mp).get
    assert(math.abs(area(fixed) - 7.0) < 1e-9) // 4 + 4 − 1
  }

  test("degenerate linework yields empty; lines/points pass through") {
    val flat = Wkb.writePolygon(Array(Array(0.0, 0, 5, 0, 5, 0, 0, 0, 0, 0)))
    assert(MakeValid.makeValid(flat).isEmpty)
    val pt = Wkb.writePoint(1, 2)
    assert(MakeValid.makeValid(pt).get.sameElements(pt))
    val ln = Wkb.writeLineString(Array(0.0, 0, 1, 1, 1, 1, 2, 0))
    val cleaned = MakeValid.makeValid(ln).get
    assert(Wkb.read(cleaned).lines(0).length == 6) // dup vertex dropped
  }
}
