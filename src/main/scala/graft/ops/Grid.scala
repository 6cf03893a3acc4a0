package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.expr.functions._

/** Grid interpolation metrics (SURVEY.md §2.4 "Grid data metrics";
  * reference: alg/gdalgrid.cpp — GGA_NearestNeighbor, InverseDistance
  * ToAPower :261, InverseDistanceToAPowerNearestNeighbor :261-331 with
  * quadtree radius search, MovingAverage; alg/gdal_alg.h:402-416 list).
  *
  * Distributed shape (replaces the reference's CPLQuadTreeSearch): points
  * carry a cell key at `level`; every grid node explodes its Chebyshev
  * cell block sized to cover `radius`, candidates meet on the cell
  * equi-join, the exact distance predicate refines, and per-node
  * aggregation computes the metric. No all-pairs stage; per-node work is
  * O(points within radius).
  *
  * EXACTNESS: inverse-distance weights are integer-quantized
  * (min(round(1e6/d²), 1e12), capped against near-coincident blowup) and
  * summed as int64 — order-free and bit-comparable to a SQL oracle;
  * values aggregate as exact integers supplied by the caller.
  */
object Grid {
  /** Search radius covered by cell rings: ring count = ⌈radius / cellH⌉
    * (cellH = 180/2^level is the smaller cell edge). */
  def ringsFor(radius: Double, level: Int): Int =
    math.ceil(radius / (180.0 / (1 << level))).toInt

  /** Candidate (node, point) pairs within `radius` — targets(t_id, t_lon,
    * t_lat) × points(p_id, p_lon, p_lat, value_i) with exact dist2. */
  def candidates(targets: DataFrame, points: DataFrame, radius: Double, level: Int = 6): DataFrame = {
    val pts = points.withColumn("__cell", cell_of(col("p_lon"), col("p_lat"), level))
    targets
      .withColumn("__tc", cell_of(col("t_lon"), col("t_lat"), level))
      .withColumn("__cell", explode(cell_block(col("__tc"), lit(ringsFor(radius, level)).cast("int"))))
      .join(pts, Seq("__cell"))
      .withColumn("dist2",
        (col("p_lon") - col("t_lon")) * (col("p_lon") - col("t_lon"))
          + (col("p_lat") - col("t_lat")) * (col("p_lat") - col("t_lat")))
      .filter(col("dist2") <= lit(radius * radius))
      .drop("__cell", "__tc")
  }

  /** GGA_NearestNeighbor: value of the closest point within radius
    * (ties by p_id); nodes with no point in radius are absent. */
  def nearest(targets: DataFrame, points: DataFrame, radius: Double, level: Int = 6): DataFrame = {
    val w = Window.partitionBy(col("t_id")).orderBy(col("dist2"), col("p_id"))
    candidates(targets, points, radius, level)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Quantized inverse-distance-squared weight (power = 2). */
  private val wq = least(round(lit(1e6) / col("dist2")), lit(1000000000000L)).cast("bigint")

  /** GGA_InverseDistanceToAPower (power 2, quantized weights): per node
    * Σw·v and Σw as exact int64 plus their double ratio. */
  def invdist(targets: DataFrame, points: DataFrame, radius: Double, level: Int = 6): DataFrame =
    candidates(targets, points, radius, level)
      .withColumn("__wq", wq)
      .groupBy(col("t_id"))
      .agg(sum(col("__wq") * col("value_i")).as("num"),
        sum(col("__wq")).as("den"),
        count(lit(1)).as("n_pts"))
      .withColumn("est", col("num").cast("double") / col("den").cast("double"))

  /** GGA_InverseDistanceToAPowerNearestNeighbor: same weighting over only
    * the nearest `maxPoints` candidates (the reference's nMaxPoints cap,
    * gdalgrid.cpp:325). */
  def invdistnn(targets: DataFrame, points: DataFrame, radius: Double, maxPoints: Int,
                level: Int = 6): DataFrame = {
    val w = Window.partitionBy(col("t_id")).orderBy(col("dist2"), col("p_id"))
    candidates(targets, points, radius, level)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPoints)
      .withColumn("__wq", wq)
      .groupBy(col("t_id"))
      .agg(sum(col("__wq") * col("value_i")).as("num"),
        sum(col("__wq")).as("den"),
        count(lit(1)).as("n_pts"))
      .withColumn("est", col("num").cast("double") / col("den").cast("double"))
  }

  /** Node→point distance quantized to floor(√dist2 · 1e6): sqrt is
    * IEEE-exactly specified, so the int is bit-comparable to a SQL oracle
    * that computes dist2 with the same operation order. */
  private val distQ = floor(sqrt(col("dist2")) * lit(1e6)).cast("bigint")

  /** GGA_Metric{Minimum,Maximum,Range,Count,AverageDistance}
    * (alg/gdal_alg.h:402-416 metric enum; alg/gdalgrid.cpp
    * GDALGridDataMetricMinimum/Maximum/Range/Count/AverageDistance): one
    * fused pass over the candidate set — per node the min/max/range of
    * point values, the point count, and the mean node→point distance.
    * Nodes with no point in radius are absent (the reference's nodata
    * branch). One shuffle (the cell equi-join), one aggregation. */
  def dataMetrics(targets: DataFrame, points: DataFrame, radius: Double, level: Int = 6): DataFrame =
    candidates(targets, points, radius, level)
      .withColumn("__dq", distQ)
      .groupBy(col("t_id"))
      .agg(min(col("value_i")).as("min_v"),
        max(col("value_i")).as("max_v"),
        (max(col("value_i")) - min(col("value_i"))).as("range_v"),
        count(lit(1)).as("n_pts"),
        sum(col("__dq")).as("sum_dist_q"))
      .withColumn("avg_dist",
        col("sum_dist_q").cast("double") / lit(1e6) / col("n_pts").cast("double"))

  /** GGA_MetricAverageDistancePts (gdalgrid.cpp
    * GDALGridDataMetricAverageDistancePts): mean PAIRWISE distance between
    * the points inside each node's radius. The pair stage self-joins the
    * candidate set on the node id, so work per node is O(occupancy²) —
    * bounded by the radius, never corpus-quadratic; nodes with fewer than
    * two points are absent (reference nodata). */
  def averageDistancePts(targets: DataFrame, points: DataFrame, radius: Double,
                         level: Int = 6): DataFrame = {
    val c = candidates(targets, points, radius, level)
      .select(col("t_id"), col("p_id"), col("p_lon"), col("p_lat"))
    c.as("a").join(c.as("b"),
        col("a.t_id") === col("b.t_id") && col("a.p_id") < col("b.p_id"))
      .select(col("a.t_id").as("t_id"),
        (((col("a.p_lon") - col("b.p_lon")) * (col("a.p_lon") - col("b.p_lon")))
          + ((col("a.p_lat") - col("b.p_lat")) * (col("a.p_lat") - col("b.p_lat")))).as("dist2"))
      .withColumn("__dq", distQ)
      .groupBy(col("t_id"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("__dq")).as("sum_dist_q"))
      .withColumn("avg_dist_pts",
        col("sum_dist_q").cast("double") / lit(1e6) / col("n_pairs").cast("double"))
  }

  /** GGA_MovingAverage: mean (as exact int sum + count) within radius. */
  def movingAverage(targets: DataFrame, points: DataFrame, radius: Double, level: Int = 6): DataFrame =
    candidates(targets, points, radius, level)
      .groupBy(col("t_id"))
      .agg(sum(col("value_i")).as("sum_v"), count(lit(1)).as("n_pts"))
      .withColumn("avg_v", col("sum_v").cast("double") / col("n_pts").cast("double"))

  /** Barycentric plane estimate with CANONICAL vertex order (sorted by
    * (x, y)): the broadcast and per-tile paths locate the same global
    * triangle under different local vertex ids, so ordering by coordinate
    * makes the float arithmetic — and therefore the estimate —
    * bit-identical across paths. NaN when q is outside the triangle. */
  private[ops] def planeEst(x1: Double, y1: Double, v1: Double,
                            x2: Double, y2: Double, v2: Double,
                            x3: Double, y3: Double, v3: Double,
                            qx: Double, qy: Double): Double = {
    var ax = x1; var ay = y1; var av = v1
    var bx = x2; var by = y2; var bv = v2
    var cx = x3; var cy = y3; var cv = v3
    @inline def lt(px: Double, py: Double, rx: Double, ry: Double): Boolean =
      px < rx || (px == rx && py < ry)
    if (lt(bx, by, ax, ay)) { val tx = ax; val ty = ay; val tv = av; ax = bx; ay = by; av = bv; bx = tx; by = ty; bv = tv }
    if (lt(cx, cy, bx, by)) { val tx = bx; val ty = by; val tv = bv; bx = cx; by = cy; bv = cv; cx = tx; cy = ty; cv = tv }
    if (lt(bx, by, ax, ay)) { val tx = ax; val ty = ay; val tv = av; ax = bx; ay = by; av = bv; bx = tx; by = ty; bv = tv }
    val w = graft.core.Delaunay.barycentric(ax, ay, bx, by, cx, cy, qx, qy)
    if (w == null) Double.NaN else w(0) * av + w(1) * bv + w(2) * cv
  }

  /** GGA_Linear (alg/delaunay.c + gdal_alg.h:402 GGA_Linear): Delaunay
    * triangulation of the point layer, barycentric plane interpolation at
    * each node; nodes outside the convex hull are absent (the reference's
    * no-data branch).
    *
    * The triangulation is a GLOBAL structure, so the point layer is
    * collected (size-guarded, like SpatialJoin.pipJoinIndexed) and
    * triangulated once; triangle envelopes bulk-load an STR tree that is
    * broadcast, and every target partition probes it with NO shuffle on
    * the target side. This broadcast path covers the reference's
    * single-node semantics and any dimension-sized point layer exactly;
    * [[linearTiled]] is the distributed path for larger layers.
    *
    * points(p_id, p_lon, p_lat, v double) × targets(t_id, t_lon, t_lat)
    * → (t_id, est). */
  def linear(targets: DataFrame, points: DataFrame, maxPoints: Int = 2000000): DataFrame = {
    val spark = targets.sparkSession
    import spark.implicits._
    val rows = points.select(col("p_lon").cast("double"), col("p_lat").cast("double"),
      col("v").cast("double")).limit(maxPoints + 1).collect()
    require(rows.length <= maxPoints,
      s"Grid.linear: point layer exceeds maxPoints=$maxPoints — triangulate per tile " +
        "with ghost margins for larger layers")
    val xs = rows.map(_.getDouble(0))
    val ys = rows.map(_.getDouble(1))
    val vs = rows.map(_.getDouble(2))
    val tri = graft.core.Delaunay.triangulate(xs, ys)
    val envs = Array.tabulate(tri.count) { t =>
      val a = tri.tris(3 * t); val b = tri.tris(3 * t + 1); val c = tri.tris(3 * t + 2)
      (math.min(xs(a), math.min(xs(b), xs(c))), math.min(ys(a), math.min(ys(b), ys(c))),
        math.max(xs(a), math.max(xs(b), xs(c))), math.max(ys(a), math.max(ys(b), ys(c))))
    }
    val bc = spark.sparkContext.broadcast(
      (graft.core.StrTree.build(envs), xs, ys, vs, tri.tris))
    targets.select(col("t_id").cast("long"), col("t_lon").cast("double"),
        col("t_lat").cast("double"))
      .as[(Long, Double, Double)]
      .mapPartitions { it =>
        val (tree, bxs, bys, bvs, tris) = bc.value
        it.flatMap { case (tid, qx, qy) =>
          val hits = tree.query(qx, qy, qx, qy)
          var est = Double.NaN
          var found = false
          var h = 0
          while (h < hits.length && !found) {
            val t = hits(h)
            val a = tris(3 * t); val b = tris(3 * t + 1); val c = tris(3 * t + 2)
            est = planeEst(bxs(a), bys(a), bvs(a), bxs(b), bys(b), bvs(b),
              bxs(c), bys(c), bvs(c), qx, qy)
            found = !est.isNaN
            h += 1
          }
          if (found) Some((tid, est)) else None
        }
      }
      .toDF("t_id", "est")
  }

  /** GGA_Linear at scale: PER-TILE Delaunay with ghost margins — the
    * distributed path for point layers past [[linear]]'s driver guard.
    *
    * Points are replicated into every tile whose margin-expanded box
    * contains them (replication factor (1 + 2·margin/tile)², a constant);
    * targets go to their own tile; a cogroup triangulates each tile's
    * point set once and answers that tile's nodes. A located triangle is
    * accepted only under the LOCALITY CERTIFICATE (its circumcircle lies
    * inside the tile's margin-expanded box — Delaunay.circumcircle): the
    * local set contains every point of that region, so a certified
    * triangle is a triangle of the GLOBAL triangulation and the estimate
    * is bit-identical to the broadcast path (canonical-order planeEst).
    * Nodes whose triangle fails the certificate are ABSENT — size
    * `marginDeg` at or above the layer's local circumradius bound (for a
    * max point spacing s, circumradii are ≤ ~s in the interior). Shuffle
    * cost: one exchange of the (replicated) point layer on the tile key —
    * no stage ever holds more than a tile's points in memory. */
  def linearTiled(targets: DataFrame, points: DataFrame,
                  tileDeg: Double, marginDeg: Double,
                  maxPerTile: Int = 2000000): DataFrame = {
    require(tileDeg > 0.0 && marginDeg >= 0.0, "tileDeg > 0, marginDeg >= 0")
    require((180.0 + marginDeg) / tileDeg < 4095.0, "tile index must fit the packed key")
    val spark = targets.sparkSession
    import spark.implicits._
    def packed(ix: org.apache.spark.sql.Column, iy: org.apache.spark.sql.Column) =
      (ix + 4096L) * 8192L + (iy + 4096L)
    val p = points
      .select(col("p_lon").cast("double").as("p_lon"),
        col("p_lat").cast("double").as("p_lat"), col("v").cast("double").as("v"))
      .withColumn("ix", explode(sequence(
        floor((col("p_lon") - marginDeg) / tileDeg).cast("long"),
        floor((col("p_lon") + marginDeg) / tileDeg).cast("long"))))
      .withColumn("iy", explode(sequence(
        floor((col("p_lat") - marginDeg) / tileDeg).cast("long"),
        floor((col("p_lat") + marginDeg) / tileDeg).cast("long"))))
      .select(packed(col("ix"), col("iy")).as("tile"), col("p_lon"), col("p_lat"), col("v"))
      .as[(Long, Double, Double, Double)]
    val t = targets
      .select(col("t_id").cast("long").as("t_id"),
        col("t_lon").cast("double").as("t_lon"), col("t_lat").cast("double").as("t_lat"))
      .select(packed(floor(col("t_lon") / tileDeg).cast("long"),
        floor(col("t_lat") / tileDeg).cast("long")).as("tile"),
        col("t_id"), col("t_lon"), col("t_lat"))
      .as[(Long, Long, Double, Double)]
    p.groupByKey(_._1).cogroup(t.groupByKey(_._1)) { (tile, pit, tit) =>
      val tgts = tit.toArray
      if (tgts.isEmpty) Iterator.empty
      else {
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double)]
        var over = false
        pit.foreach { r => if (buf.length > maxPerTile) over = true else buf += ((r._2, r._3, r._4)) }
        require(!over, s"Grid.linearTiled: tile $tile exceeds maxPerTile=$maxPerTile — shrink tileDeg")
        if (buf.length < 3) Iterator.empty
        else {
          val xs = buf.map(_._1).toArray
          val ys = buf.map(_._2).toArray
          val vs = buf.map(_._3).toArray
          val tri = graft.core.Delaunay.triangulate(xs, ys)
          val envs = Array.tabulate(tri.count) { k =>
            val a = tri.tris(3 * k); val b = tri.tris(3 * k + 1); val c = tri.tris(3 * k + 2)
            (math.min(xs(a), math.min(xs(b), xs(c))), math.min(ys(a), math.min(ys(b), ys(c))),
              math.max(xs(a), math.max(xs(b), xs(c))), math.max(ys(a), math.max(ys(b), ys(c))))
          }
          val tree = graft.core.StrTree.build(envs)
          val ix = tile / 8192L - 4096L; val iy = tile % 8192L - 4096L
          val minX = ix * tileDeg - marginDeg; val maxX = (ix + 1) * tileDeg + marginDeg
          val minY = iy * tileDeg - marginDeg; val maxY = (iy + 1) * tileDeg + marginDeg
          tgts.iterator.flatMap { case (_, tid, qx, qy) =>
            val hits = tree.query(qx, qy, qx, qy)
            var est = Double.NaN
            var found = false
            var h = 0
            while (h < hits.length && !found) {
              val k = hits(h)
              val a = tri.tris(3 * k); val b = tri.tris(3 * k + 1); val c = tri.tris(3 * k + 2)
              val e = planeEst(xs(a), ys(a), vs(a), xs(b), ys(b), vs(b),
                xs(c), ys(c), vs(c), qx, qy)
              if (!e.isNaN) {
                val (ccx, ccy, r2) = graft.core.Delaunay.circumcircle(
                  xs(a), ys(a), xs(b), ys(b), xs(c), ys(c))
                val r = math.sqrt(r2)
                if (ccx - r >= minX && ccx + r <= maxX && ccy - r >= minY && ccy + r <= maxY) {
                  est = e
                  found = true
                }
              }
              h += 1
            }
            if (found) Some((tid, est)) else None
          }
        }
      }
    }.toDF("t_id", "est")
  }
}
