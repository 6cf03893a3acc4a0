package graft.core

/** Packed sort-tile-recursive (STR) R-tree, bulk-loaded once and
  * immutable — the local fine-grained spatial index of SURVEY.md §4
  * (pattern: FlatGeoBuf's packed Hilbert R-tree,
  * ogr/ogrsf_frmts/flatgeobuf/packedrtree.h:78-139, and the in-memory
  * CPLQuadTree used by the reference's gridder, port/cpl_quad_tree.h —
  * behavior only). Leaves hold user payload indices; envelope queries
  * walk only intersecting subtrees.
  *
  * Bulk load (classic STR): sort by center-x, slice into √(n/B) vertical
  * strips, sort each strip by center-y, pack B entries per leaf; build
  * upper levels the same way over node envelopes.
  */
final class StrTree private (
    nodeMinX: Array[Double], nodeMinY: Array[Double],
    nodeMaxX: Array[Double], nodeMaxY: Array[Double],
    children: Array[Array[Int]], // node id -> child node ids (inner) or payload ids (leaf)
    pMinX: Array[Double], pMinY: Array[Double], // payload envelopes (exact leaf filter)
    pMaxX: Array[Double], pMaxY: Array[Double],
    leafStart: Int, root: Int) extends Serializable {

  /** Payload ids whose envelope intersects the query box. */
  def query(minx: Double, miny: Double, maxx: Double, maxy: Double): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    val stack = new scala.collection.mutable.ArrayDeque[Int]()
    stack.append(root)
    while (stack.nonEmpty) {
      val n = stack.removeLast()
      if (Pip.bboxIntersects(nodeMinX(n), nodeMinY(n), nodeMaxX(n), nodeMaxY(n),
        minx, miny, maxx, maxy)) {
        if (n >= leafStart) {
          children(n).foreach { p =>
            if (Pip.bboxIntersects(pMinX(p), pMinY(p), pMaxX(p), pMaxY(p), minx, miny, maxx, maxy))
              out += p
          }
        } else children(n).foreach(stack.append)
      }
    }
    out.toArray
  }

  def queryPoint(x: Double, y: Double): Array[Int] = query(x, y, x, y)
}

object StrTree {
  val DefaultFanout = 16

  /** Bulk-load from payload envelopes (minx, miny, maxx, maxy) per id. */
  def build(envs: Array[(Double, Double, Double, Double)], fanout: Int = DefaultFanout): StrTree = {
    require(envs.nonEmpty, "empty STR tree")
    val n = envs.length
    val ids = Array.tabulate(n)(identity)
    // STR leaf packing
    val nLeaves = math.ceil(n.toDouble / fanout).toInt
    val nStrips = math.ceil(math.sqrt(nLeaves.toDouble)).toInt
    val perStrip = math.ceil(n.toDouble / nStrips).toInt
    val byX = ids.sortBy(i => envs(i)._1 + envs(i)._3)
    val leaves = byX.grouped(perStrip).flatMap { strip =>
      strip.sortBy(i => envs(i)._2 + envs(i)._4).grouped(fanout)
    }.toArray

    val minX = scala.collection.mutable.ArrayBuffer.empty[Double]
    val minY = scala.collection.mutable.ArrayBuffer.empty[Double]
    val maxX = scala.collection.mutable.ArrayBuffer.empty[Double]
    val maxY = scala.collection.mutable.ArrayBuffer.empty[Double]
    val kids = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]

    // node layout: inner nodes first (built after leaves, prepended by
    // renumbering at the end is fiddly) — simpler: build bottom-up with
    // leaves at the HIGH indices. Collect levels, then concatenate.
    final case class Lvl(envs: Array[(Double, Double, Double, Double)], kids: Array[Array[Int]])

    def envOf(group: Array[Int], e: Int => (Double, Double, Double, Double)) = {
      var mnx = Double.MaxValue; var mny = Double.MaxValue
      var mxx = -Double.MaxValue; var mxy = -Double.MaxValue
      group.foreach { i =>
        val (a, b, c, d) = e(i)
        if (a < mnx) mnx = a; if (b < mny) mny = b
        if (c > mxx) mxx = c; if (d > mxy) mxy = d
      }
      (mnx, mny, mxx, mxy)
    }

    val leafLvl = Lvl(leaves.map(g => envOf(g, envs)), leaves)
    var levels = List(leafLvl)
    while (levels.head.envs.length > 1) {
      val cur = levels.head
      val m = cur.envs.length
      val cIds = Array.tabulate(m)(identity)
      val nL = math.ceil(m.toDouble / fanout).toInt
      val nS = math.ceil(math.sqrt(nL.toDouble)).toInt
      val per = math.ceil(m.toDouble / nS).toInt
      val grouped = cIds.sortBy(i => cur.envs(i)._1 + cur.envs(i)._3)
        .grouped(per).flatMap(strip =>
          strip.sortBy(i => cur.envs(i)._2 + cur.envs(i)._4).grouped(fanout)).toArray
      levels = Lvl(grouped.map(g => envOf(g, cur.envs)), grouped) :: levels
    }

    // concatenate: root level first … leaf level last; child ids offset
    // by the next level's base
    val sizes = levels.map(_.envs.length)
    val bases = sizes.scanLeft(0)(_ + _)
    levels.zipWithIndex.foreach { case (lvl, li) =>
      val isLeafLvl = li == levels.length - 1
      val childBase = if (isLeafLvl) 0 else bases(li + 1)
      lvl.envs.zip(lvl.kids).foreach { case ((a, b, c, d), g) =>
        minX += a; minY += b; maxX += c; maxY += d
        kids += (if (isLeafLvl) g else g.map(_ + childBase))
      }
    }
    val leafBase = bases(levels.length - 1)
    new StrTree(minX.toArray, minY.toArray, maxX.toArray, maxY.toArray,
      kids.toArray,
      envs.map(_._1), envs.map(_._2), envs.map(_._3), envs.map(_._4),
      leafBase, root = 0)
  }
}
