package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.expr.functions._

/** Exact distributed k-nearest-neighbors via cell-ring expansion
  * (SURVEY.md §2.3 kNN; reference semantics: per-target radius search with
  * distance-sorted cap, alg/gdalgrid.cpp:261-331 over a quadtree —
  * re-expressed as iterated cell equi-joins).
  *
  * Round r: each unresolved target joins candidate points in its
  * Chebyshev cell block of radius r; top-k by (dist², id) is taken with a
  * window. A target is RESOLVED when its kth distance is provably inside
  * the ring guarantee — every point with euclid distance < (r−1)·cellH is
  * inside rings 0..r (worst case: target at a cell corner) — or when the
  * block already covers the whole grid. Unresolved targets retry with 2r.
  * Planar lon/lat distance (the corpus contract; no great-circle).
  *
  * Exactness over approximation is the point: output matches a brute-force
  * cross-join oracle bit-for-bit, while touching only O(k) candidates per
  * target at scale.
  */
object Knn {

  /** targets(t_id, t_lon, t_lat) × points(p_id, p_lon, p_lat)
    * → (t_id, p_id, dist2, rank), rank 1..k per target.
    *
    * Plan discipline (the driver loop is over a SMALL, shrinking target
    * frontier — the candidate point table is touched only through the cell
    * equi-join): `pts` (cell-keyed points) and each round's `cand` are
    * persisted so resolvedIds/resolvedParts never recompute the join, and
    * the frontier is persisted+counted each round so its lineage never
    * re-derives previous rounds. Targets still unresolved when the doubling
    * loop ends get one final FULL-COVER round (r = 2^level covers the whole
    * grid), so the bit-exact-vs-brute-force contract holds for every
    * target regardless of maxRounds/level. */
  def knnJoin(targets: DataFrame, points: DataFrame, k: Int, level: Int = 6,
              maxRounds: Int = 8): DataFrame = {
    val spark = targets.sparkSession
    val cellH = 180.0 / (1 << level) // min cell dimension in degrees
    val pts = graft.pipeline.Caches.persist(points
      .withColumn("__cell", cell_of(col("p_lon"), col("p_lat"), level)))
    val w = Window.partitionBy(col("t_id")).orderBy(col("dist2"), col("p_id"))
    val fullCoverR = 1 << level

    // second window over the SAME t_id partitioning (its required sort is
    // a prefix of w's, so the plan keeps ONE Exchange + ONE Sort): n and
    // kth-distance over the rank-filtered rows fuse the old per-round
    // resolvedIds aggregate into the candidate pass itself.
    val wAll = Window.partitionBy(col("t_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    def candidatesAt(frontier: DataFrame, r: Int, safe2: Double): DataFrame = frontier
      .withColumn("__tc", cell_of(col("t_lon"), col("t_lat"), level))
      .withColumn("__cell", explode(cell_block(col("__tc"), lit(r).cast("int"))))
      .join(pts, Seq("__cell"))
      .withColumn("dist2",
        (col("p_lon") - col("t_lon")) * (col("p_lon") - col("t_lon"))
          + (col("p_lat") - col("t_lat")) * (col("p_lat") - col("t_lat")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("__resolved",
        count(lit(1)).over(wAll) === k && max(col("dist2")).over(wAll) < safe2)
      .select(col("t_id"), col("p_id"), col("dist2"), col("rank"), col("__resolved"))

    // persist a projected COPY, not the caller's frame: the first-round
    // Caches.drop(frontier) must never unpersist a frame the caller may
    // have cached for reuse (the Project gives it a distinct cache entry)
    var frontier = graft.pipeline.Caches.persist(
      targets.select(targets.columns.map(col): _*))
    // -1 = unknown (skip the up-front count; round 1 runs unconditionally
    // and the per-round count doubles as the loop-exit check)
    var frontierN = -1L
    var resolvedParts = List.empty[DataFrame]
    var r = 1
    var round = 0
    while (round < maxRounds && frontierN != 0 && r < fullCoverR) {
      // every point OUTSIDE ring r is ≥ r·cellH away (its cell is ≥ r+1
      // cells from the target's cell; worst case both sit on the facing
      // boundaries). STRICT < keeps equal-distance outside ties safe.
      val safe = r.toDouble * cellH
      val cand = graft.pipeline.Caches.persist(candidatesAt(frontier, r, safe * safe))
      resolvedParts ::= cand.filter(col("__resolved"))
        .select(col("t_id"), col("p_id"), col("dist2"), col("rank"))
      // rename to dodge self-join attribute ambiguity (cand derives from frontier)
      val rid = cand.filter(col("__resolved"))
        .select(col("t_id").as("__rt_id"))
      val next = graft.pipeline.Caches.persist(
        frontier.join(rid, col("t_id") === col("__rt_id"), "left_anti"))
      frontierN = next.count()
      graft.pipeline.Caches.drop(frontier)
      frontier = next
      r *= 2
      round += 1
    }
    // exactness backstop: whatever is left gets the whole grid in one round
    if (frontierN != 0) resolvedParts ::= candidatesAt(frontier, fullCoverR, Double.MaxValue)
      .select(col("t_id"), col("p_id"), col("dist2"), col("rank"))
    val all = resolvedParts.reduceOption(_ union _)
      .getOrElse(spark.emptyDataFrame)
    // cand persists stay referenced by `all`'s plan and are tracked in
    // pipeline.Caches — the harness releases them after materialization
    all
  }

  /** Brute-force reference (cross join) — the oracle shape; use only for
    * verification or tiny target sets. */
  def bruteForce(targets: DataFrame, points: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("t_id")).orderBy(col("dist2"), col("p_id"))
    targets.crossJoin(points)
      .withColumn("dist2",
        (col("p_lon") - col("t_lon")) * (col("p_lon") - col("t_lon"))
          + (col("p_lat") - col("t_lat")) * (col("p_lat") - col("t_lat")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("t_id"), col("p_id"), col("dist2"), col("rank"))
  }
}
