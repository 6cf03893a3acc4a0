package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair list — the clustering
  * stage every near-dup pipeline needs after candidate generation: the
  * pair emitters ([[Dedup.minhashCandidates]], [[Dedup.hammingNearDup]],
  * [[Dedup.cosineNearDup]]) produce edges; picking ONE canonical document
  * per duplicate CLUSTER requires the transitive closure of those edges.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — each round
  * is two groupBy-shuffles over the edge list and the edge list only;
  * convergence in O(log n) rounds INDEPENDENT of graph diameter, unlike
  * naive min-label propagation whose round count is the diameter (a
  * 100 TB near-dup graph can contain long duplicate chains). No
  * adjacency ever materializes per-node beyond one groupBy row, and no
  * driver state beyond the per-round convergence counter.
  *
  *  - large-star(u): every neighbor v > u re-points to
  *    m(u) = min(N(u) ∪ u)
  *  - small-star(u): every neighbor v ≤ u (and u itself) points to m(u)
  *
  * Fixpoint = a star forest: every edge is (child → component-min root),
  * detected locally as "out-degree 1 for every child AND no child is
  * also a parent" — both are one aggregation over the current edges.
  * Each round eagerly materializes via localCheckpoint to cut the
  * iterative lineage (the q104 discipline).
  */
object Components {

  /** (id, component) for every node in `nodes` (or every edge endpoint if
    * `nodes` is null), where component = the minimum node id reachable
    * through `edges`. Edge direction/duplication is irrelevant. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          nodes: DataFrame = null, nodeCol: String = "id",
                          maxIter: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    var e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)

    var converged = e.isEmpty
    var it = 0
    while (!converged && it < maxIter) {
      // Per-node minimums come from a groupBy-min joined back on the same
      // key (one exchange, co-partitioned join) — NEVER a collect_set of
      // the adjacency: in late rounds the component root's neighborhood
      // IS the whole component, and a per-row array of a billion-node
      // component is an executor OOM. Row counts stay O(|edges|).
      //
      // large-star: m(u) = min(N(u) ∪ u) over the symmetrized adjacency;
      // every neighbor v > u re-points to m(u).
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mLarge = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = sym.join(mLarge, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // small-star: large-star's edges are all (bigger → smaller), so
      // grouping them as-is by u gives exactly the "neighbors ≤ u" star;
      // m(u) = min of the group, each group member (and u itself) points
      // to m(u).
      val mSmall = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val small = large.join(mSmall, Seq("u"))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mSmall.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint(true)
      // star-forest test: every child points to exactly one parent and no
      // child is itself a parent — one aggregation + one broadcast-size join
      val deg = small.groupBy(col("u")).agg(countDistinct(col("v")).as("d"))
      val multi = deg.filter(col("d") > 1).limit(1).count()
      val childAsParent =
        if (multi > 0) 1L
        else small.select(col("u")).intersect(small.select(col("v"))).limit(1).count()
      e = small
      converged = multi == 0 && childAsParent == 0
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // star edges: u → root. Roots + singletons map to themselves.
    val assigned = e.select(col("u").as(nodeCol), col("v").as("component"))
    val all =
      if (nodes == null)
        e.select(col("u")).union(e.select(col("v"))).distinct().select(col("u").as(nodeCol))
      else nodes.select(col(nodeCol)).distinct()
    all.join(assigned, Seq(nodeCol), "left")
      .select(col(nodeCol), coalesce(col("component"), col(nodeCol)).as("component"))
  }
}
