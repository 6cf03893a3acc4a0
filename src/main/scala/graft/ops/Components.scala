package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

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
  * adjacency ever materializes per-node beyond one groupBy row; driver
  * state is the per-round convergence row plus, once the shrinking edge
  * list fits the `maxLocalEdges` guard, a bounded union-find finish.
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
    * through `edges`. Edge direction/duplication is irrelevant.
    *
    * `maxLocalEdges`: once the live edge list is at or below this size
    * (checked before the loop and after every round — star-contraction
    * only ever shrinks it), the remaining closure is finished with a
    * driver-side union-find instead of more Spark rounds. A near-dup
    * graph usually collapses to a few hundred edges after round one, at
    * which point each further distributed round is pure job latency; the
    * collect is bounded (≤ ~16 B/edge) and the distributed loop still
    * carries anything larger — the Knn/Georef guarded-collect
    * discipline. Set 0 to force the fully distributed path. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          nodes: DataFrame = null, nodeCol: String = "id",
                          maxIter: Int = 50, maxLocalEdges: Long = 500000): DataFrame = {
    var e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)

    var edgeCount = e.count()
    // Iteration cost is dominated by fixed per-stage latency once the edge
    // list is small (near-dup graphs usually collapse within 2 rounds), so
    // adapt the plan width to the data like AQE would: ≥50k edges per
    // shuffle partition, floor 1.
    def widthFor(n: Long): Int =
      math.max(1, math.min(e.sparkSession.sparkContext.defaultParallelism,
        (n / 50000L).toInt))

    var converged = edgeCount == 0
    var it = 0
    while (!converged && edgeCount > maxLocalEdges && it < maxIter) {
      val w = widthFor(edgeCount)
      // Per-node minimums come from a groupBy-min joined back on the same
      // key (one exchange, co-partitioned join) — NEVER a collect_set of
      // the adjacency: in late rounds the component root's neighborhood
      // IS the whole component, and a per-row array of a billion-node
      // component is an executor OOM. Row counts stay O(|edges|).
      //
      // large-star: m(u) = min(N(u) ∪ u) over the symmetrized adjacency;
      // every neighbor v > u re-points to m(u).
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
        .repartition(w, col("u"))
      val mLarge = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      // No distinct here: each symmetrized edge emits at most one row, so
      // |large| ≤ 2|e| regardless; duplicate (v,m) rows cannot change the
      // min-aggregations below and `small`'s trailing distinct dedups the
      // round's output. Saves a full exchange per round.
      val large = sym.join(mLarge, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
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
      // child is itself a parent. ONE probe job over the checkpointed
      // edges (the edge list is distinct, so per-node child-row count IS
      // the distinct-parent count): tag each endpoint with its role,
      // group once, and fold both violations plus the live edge count
      // into a single row. 2 jobs/round total (materialize + probe) —
      // per-round job latency is what dominates once the near-dup graph
      // collapses to a few hundred edges.
      val probe = small.select(col("u").as("n"), lit(1).as("c"), lit(0).as("p"))
        .union(small.select(col("v").as("n"), lit(0).as("c"), lit(1).as("p")))
        .groupBy(col("n"))
        .agg(sum(col("c")).as("deg"), max(col("c")).as("ic"), max(col("p")).as("ip"))
        .agg(
          sum(col("deg")).as("edges"),
          max(when(col("deg") > 1, 1).otherwise(0)).as("multi"),
          max(when(col("ic") === 1 && col("ip") === 1, 1).otherwise(0)).as("cap"))
        .head()
      e = small
      edgeCount = if (probe.isNullAt(0)) 0L else probe.getLong(0)
      converged = edgeCount == 0 ||
        (probe.getInt(1) == 0 && probe.getInt(2) == 0)
      it += 1
    }
    require(converged || edgeCount <= maxLocalEdges,
      s"connectedComponents did not converge in $maxIter rounds")
    // star edges: u → root. Roots + singletons map to themselves.
    val assigned =
      if (converged) e.select(col("u").as(nodeCol), col("v").as("component"))
      else localClosure(e, nodeCol)
    val all =
      if (nodes == null)
        e.select(col("u")).union(e.select(col("v"))).distinct().select(col("u").as(nodeCol))
      else nodes.select(col(nodeCol)).distinct()
    all.join(assigned, Seq(nodeCol), "left")
      .select(col(nodeCol), coalesce(col("component"), col(nodeCol)).as("component"))
  }

  /** Driver union-find finish for a small residual edge list: min-id
    * roots (union attaches the larger root under the smaller, path
    * compression on find), emitting (node, root) for every non-root
    * endpoint — identical semantics to a converged star forest. */
  private def localClosure(e: DataFrame, nodeCol: String): DataFrame = {
    val spark = e.sparkSession
    val rows = e.collect()
    val parent = new java.util.HashMap[Any, Any]()
    def cmp(a: Any, b: Any): Int = a.asInstanceOf[Comparable[Any]].compareTo(b)
    def find(x: Any): Any = {
      var r = x
      var p = parent.getOrDefault(r, r)
      while (p != r) { r = p; p = parent.getOrDefault(r, r) }
      var c = x
      while (c != r) { val nxt = parent.get(c); parent.put(c, r); c = nxt }
      r
    }
    rows.foreach { row =>
      val ru = find(row.get(0)); val rv = find(row.get(1))
      if (ru != rv) {
        if (cmp(ru, rv) <= 0) parent.put(rv, ru) else parent.put(ru, rv)
      }
    }
    val seen = new java.util.LinkedHashSet[Any]()
    rows.foreach { row => seen.add(row.get(0)); seen.add(row.get(1)) }
    val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](seen.size)
    seen.forEach { n =>
      val r = find(n)
      if (r != n) out += org.apache.spark.sql.Row(n, r)
    }
    val dt = e.schema.head.dataType
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(nodeCol, dt),
      org.apache.spark.sql.types.StructField("component", dt)))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](out.asJava), schema)
  }
}
