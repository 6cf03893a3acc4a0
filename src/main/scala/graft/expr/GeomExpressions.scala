package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import graft.core.{Clip, GeomOps}

/** Geometry measure + overlay expressions (SURVEY.md §2.7 measures,
  * §2.3 layer-algebra kernels). Scalar measures are codegen'd static
  * calls; geometry-output overlays use CodegenFallback (per-row cost is
  * the kernel, and empty results must surface as SQL NULL). */

/** st_area(wkb) → double (shoelace; holes subtract; ogrgeometry get_Area). */
case class StArea(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_area"
  override protected def nullSafeEval(wkb: Any): Any = GeomOps.area(wkb.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, wkb => s"graft.core.GeomOps.area($wkb)")
  override protected def withNewChildInternal(c: Expression): StArea = copy(child = c)
}

/** st_length(wkb) → double (perimeter for areal geometries). */
case class StLength(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_length"
  override protected def nullSafeEval(wkb: Any): Any = GeomOps.length(wkb.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, wkb => s"graft.core.GeomOps.length($wkb)")
  override protected def withNewChildInternal(c: Expression): StLength = copy(child = c)
}

/** st_centroid(wkb) → array<double>[cx, cy] (area-weighted, ogrgeometry
  * Centroid :6526 semantics). */
case class StCentroid(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_centroid"
  override protected def nullSafeEval(wkb: Any): Any =
    GeomKernels.centroidArr(wkb.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, wkb => s"graft.expr.GeomKernels.centroidArr($wkb)")
  override protected def withNewChildInternal(c: Expression): StCentroid = copy(child = c)
}

/** st_num_points(wkb) → int (OGR getNumPoints; closing vertices counted). */
case class StNumPoints(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_num_points"
  override protected def nullSafeEval(wkb: Any): Any = GeomOps.numPoints(wkb.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, wkb => s"graft.core.GeomOps.numPoints($wkb)")
  override protected def withNewChildInternal(c: Expression): StNumPoints = copy(child = c)
}

/** st_distance(a, b) → double (min euclidean; 0 when touching/overlapping;
  * ogrgeometry Distance :3818). */
case class StDistance(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_distance"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeomOps.distance(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.core.GeomOps.distance($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StDistance =
    copy(left = l, right = r)
}

/** st_convexhull(wkb) → polygon WKB (Andrew monotone chain over vertices;
  * ogrgeometry ConvexHull :4449). */
/** st_concave_hull(wkb, ratio) → polygon WKB — chi-shape concave hull
  * (gdalalg_vector_concave_hull.cpp ratio contract; GeomOps.concaveHull). */
case class StConcaveHull(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_concave_hull"
  override protected def nullSafeEval(wkb: Any, r: Any): Any =
    GeomOps.concaveHull(wkb.asInstanceOf[Array[Byte]], r.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, r) => s"graft.core.GeomOps.concaveHull($w, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StConcaveHull =
    copy(left = l, right = r)
}

case class StConvexHull(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_convexhull"
  override protected def nullSafeEval(wkb: Any): Any =
    GeomOps.convexHull(wkb.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, wkb => s"graft.core.GeomOps.convexHull($wkb)")
  override protected def withNewChildInternal(c: Expression): StConvexHull = copy(child = c)
}

/** st_intersection(subject, convexClip) → WKB | NULL when empty
  * (ogrlayer.cpp:5385 Intersection's per-pair geometry step). */
case class StIntersection(left: Expression, right: Expression)
    extends Expression with ExpectsInputTypes with CodegenFallback {
  override def children: Seq[Expression] = Seq(left, right)
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_intersection"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input); val b = right.eval(input)
    if (a == null || b == null) null
    else Clip.intersection(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]]).orNull
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): StIntersection =
    StIntersection(c(0), c(1))
}

/** st_difference(subject, convexClip) → WKB | NULL when fully erased
  * (ogrlayer.cpp:7846 Erase's per-pair geometry step). */
case class StDifference(left: Expression, right: Expression)
    extends Expression with ExpectsInputTypes with CodegenFallback {
  override def children: Seq[Expression] = Seq(left, right)
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_difference"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input); val b = right.eval(input)
    if (a == null || b == null) null
    else Clip.difference(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]]).orNull
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): StDifference =
    StDifference(c(0), c(1))
}

/** st_difference_all(subject, array<convexClip>) → WKB | NULL — subject
  * minus every clip geometry in sequence (the Erase inner loop when one
  * feature overlaps several erase polygons). */
case class StDifferenceAll(left: Expression, right: Expression)
    extends Expression with ExpectsInputTypes with CodegenFallback {
  override def children: Seq[Expression] = Seq(left, right)
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, ArrayType(BinaryType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_difference_all"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input); val b = right.eval(input)
    if (a == null) return null
    if (b == null) return a
    val clips = b.asInstanceOf[ArrayData]
    var cur: Option[Array[Byte]] = Some(a.asInstanceOf[Array[Byte]])
    var i = 0
    while (i < clips.numElements() && cur.nonEmpty) {
      val c = clips.getBinary(i)
      if (c != null) cur = Clip.difference(cur.get, c)
      i += 1
    }
    cur.orNull
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): StDifferenceAll =
    StDifferenceAll(c(0), c(1))
}

/** st_buffer(wkb, distance, quadsegs) → buffered (multi)polygon WKB, or
  * null when fully eroded (OGRGeometry::Buffer, ogrgeometry.cpp:4949 —
  * Minkowski-sum implementation in core.Buffer). Negative distance
  * erodes polygons. Returns null for empty results, matching the
  * overlay kernels' empty-geometry convention. */
case class StBuffer(first: Expression, second: Expression, third: Expression)
    extends Expression with ExpectsInputTypes with CodegenFallback {
  override def children: Seq[Expression] = Seq(first, second, third)
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType, DoubleType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_buffer"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val w = first.eval(input); val r = second.eval(input); val q = third.eval(input)
    if (w == null || r == null || q == null) null
    else graft.core.Buffer.buffer(w.asInstanceOf[Array[Byte]],
      r.asInstanceOf[Double], q.asInstanceOf[Int]).orNull
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): StBuffer =
    StBuffer(c(0), c(1), c(2))
}

/** st_make_valid(wkb) → repaired WKB (even-odd linework rebuild, see
  * core/MakeValid; OGRGeometry::MakeValid, ogrgeometry.cpp:4183).
  * Already-valid input passes through byte-identical; null for an
  * empty (fully degenerate) result. */
case class StMakeValid(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_make_valid"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val w = child.eval(input)
    if (w == null) null
    else graft.core.MakeValid.makeValid(w.asInstanceOf[Array[Byte]]).orNull
  }
  override protected def withNewChildInternal(c: Expression): StMakeValid = copy(child = c)
}

/** st_is_valid(wkb) — the polygonal validity predicate MakeValid
  * repairs against (closed, duplicate-free rings; no crossings or
  * interior T-junctions within or between parts); points/lines are
  * always valid (OGR_G_IsValid, ogrgeometry.cpp:4119). */
case class StIsValid(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "st_is_valid"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val w = child.eval(input)
    if (w == null) null
    else {
      val g = graft.core.Wkb.read(w.asInstanceOf[Array[Byte]])
      if (g.geomType == graft.core.Wkb.PolygonType || g.geomType == graft.core.Wkb.MultiPolygonType)
        graft.core.MakeValid.isValidPolygonal(g)
      else true
    }
  }
  override protected def withNewChildInternal(c: Expression): StIsValid = copy(child = c)
}

/** st_transform(wkb, fromSrid, toSrid) → WKB with every vertex
  * reprojected (OGRWarpedLayer analog, ogrwarpedlayer.h:33). */
case class StTransform(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_transform"
  override protected def nullSafeEval(wkb: Any, from: Any, to: Any): Any =
    GeomOps.transform(wkb.asInstanceOf[Array[Byte]], from.asInstanceOf[Int], to.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, f, t) => s"graft.core.GeomOps.transform($w, $f, $t)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): StTransform =
    copy(first = f, second = s, third = t)
}

/** st_union_agg: typed Aggregator dissolving simple polygons (convex or
  * not; ear-clip decomposed) into a disjoint-piece multipolygon
  * (gdalalg_vector_dissolve.cpp semantics:
  * GROUP BY field + union of geometries). reduce/merge only DECOMPOSE and
  * CONCATENATE convex pieces (cheap, associative — map-side combine
  * stays); the actual overlap resolution happens ONCE per group in
  * `finish` via the cascaded STR-tree merge (Clip.unionPieces — the
  * UnionCascaded shape), so a k-feature group costs O(k log k) envelope
  * work instead of the former per-reduce all-pairs subtraction. Result is
  * partitioning-order invariant in AREA (piece layout may differ by merge
  * order; area and coverage are exact). */
object UnionAgg extends org.apache.spark.sql.expressions.Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  import graft.core.Wkb
  // buffer = [4-byte BE watermark][multipolygon WKB of accumulated convex
  // pieces] (pieces possibly overlapping across inputs; disjoint within
  // one input); empty = ∅. The watermark is the piece count left by the
  // last in-flight compaction: unbounded concat would grow the shuffled
  // buffer O(total input pieces) on mass-duplicate or very large groups
  // (ultimately toward the JVM 2 GB array limit), so once the count
  // crosses max(CompactMin, 2×watermark) the buffer is compacted with the
  // same cascaded merge `finish` uses. The doubling schedule makes the
  // amortized compaction cost O(log) per group: duplicate-heavy buffers
  // collapse and stay small; genuinely wide coverage compacts only when
  // it has doubled since the last pass.
  private val CompactMin = 512
  private def unpack(buf: Array[Byte]): (Int, Array[Array[Double]]) =
    if (buf.isEmpty) (0, Array.empty)
    else {
      val wm = ((buf(0) & 0xFF) << 24) | ((buf(1) & 0xFF) << 16) |
        ((buf(2) & 0xFF) << 8) | (buf(3) & 0xFF)
      val wkb = java.util.Arrays.copyOfRange(buf, 4, buf.length)
      (wm, Wkb.read(wkb).polygons.map(_.rings(0)))
    }
  private def pack(wm: Int, pieces: Array[Array[Double]]): Array[Byte] = {
    if (pieces.isEmpty) return Array.emptyByteArray
    val wkb = Wkb.writeMultiPolygon(pieces.map(r => Array(r)))
    val out = new Array[Byte](wkb.length + 4)
    out(0) = (wm >>> 24).toByte; out(1) = (wm >>> 16).toByte
    out(2) = (wm >>> 8).toByte; out(3) = wm.toByte
    System.arraycopy(wkb, 0, out, 4, wkb.length)
    out
  }
  private def combine(wm: Int, a: Array[Array[Double]], b: Array[Array[Double]]): Array[Byte] = {
    val all = a ++ b
    if (all.length >= math.max(CompactMin, 2 * wm)) {
      val compacted = Clip.unionPieces(all.map(Array(_)))
      pack(compacted.length, compacted)
    } else pack(wm, all)
  }
  override def zero: Array[Byte] = Array.emptyByteArray
  override def reduce(buf: Array[Byte], geom: Array[Byte]): Array[Byte] = {
    if (geom == null || geom.isEmpty) return buf
    val pieces = graft.core.Triangulate.convexPieces(geom)
    if (pieces.isEmpty) return buf
    val (wm, a) = unpack(buf)
    combine(wm, a, pieces)
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val (wmA, aR) = unpack(a)
    val (wmB, bR) = unpack(b)
    combine(math.max(wmA, wmB), aR, bR)
  }
  override def finish(buf: Array[Byte]): Array[Byte] = {
    if (buf.isEmpty) return null
    // each buffered piece is convex: union as single-piece groups
    val groups = unpack(buf)._2.map(Array(_))
    val pieces = Clip.unionPieces(groups)
    if (pieces.isEmpty) null else Wkb.writeMultiPolygon(pieces.map(r => Array(r)))
  }
  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
}

/** st_make_box(minx, miny, maxx, maxy) → polygon WKB (axis-aligned box). */
case class StMakeBox(first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_make_box"
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    graft.core.Wkb.writeBox(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) => s"graft.core.Wkb.writeBox($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression, q: Expression): StMakeBox =
    copy(first = f, second = s, third = t, fourth = q)
}

/** st_intersects(a, b) → boolean — the canonical OGR predicate
  * (ogrgeometry.cpp Intersects :575): envelope fast-path then exact
  * (min-distance == 0 covers crossing, touching, and containment). */
case class StIntersects(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_intersects"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeomKernels.intersects(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.GeomKernels.intersects($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StIntersects =
    copy(left = l, right = r)
}

/** st_disjoint(a, b) = NOT st_intersects (ogrgeometry Disjoint :6009). */
case class StDisjoint(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_disjoint"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    !GeomKernels.intersects(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"(!graft.expr.GeomKernels.intersects($a, $b))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StDisjoint =
    copy(left = l, right = r)
}

/** st_swap_xy(wkb) → WKB with coordinates exchanged
  * (gdalalg_vector_swap_xy). */
case class StSwapXY(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_swap_xy"
  override protected def nullSafeEval(wkb: Any): Any = GeomOps.swapXY(wkb.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, w => s"graft.core.GeomOps.swapXY($w)")
  override protected def withNewChildInternal(c: Expression): StSwapXY = copy(child = c)
}

/** st_segmentize(wkb, maxLen) → WKB with every segment ≤ maxLen
  * (gdalalg_vector_segmentize). */
case class StSegmentize(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_segmentize"
  override protected def nullSafeEval(wkb: Any, m: Any): Any =
    GeomOps.segmentize(wkb.asInstanceOf[Array[Byte]], m.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, m) => s"graft.core.GeomOps.segmentize($w, $m)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StSegmentize =
    copy(left = l, right = r)
}

/** st_simplify(wkb, tolerance) → Douglas–Peucker simplified WKB
  * (gdalalg_vector_simplify). */
case class StSimplify(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_simplify"
  override protected def nullSafeEval(wkb: Any, t: Any): Any =
    GeomOps.simplify(wkb.asInstanceOf[Array[Byte]], t.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, t) => s"graft.core.GeomOps.simplify($w, $t)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StSimplify =
    copy(left = l, right = r)
}

/** st_simplify_topo(wkb, tolerance) → topology-preserving simplified WKB
  * (OGRGeometry::SimplifyPreserveTopology, ogrgeometry.cpp:6856): DP
  * plus vertex restoration so no ring collapses or self-intersects. */
case class StSimplifyTopo(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_simplify_topo"
  override protected def nullSafeEval(wkb: Any, t: Any): Any =
    GeomOps.simplifyTopo(wkb.asInstanceOf[Array[Byte]], t.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, t) => s"graft.core.GeomOps.simplifyTopo($w, $t)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StSimplifyTopo =
    copy(left = l, right = r)
}

/** st_dump(wkb) → array<binary> of the parts (explode_collections). */
case class StDump(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_dump"
  override protected def nullSafeEval(wkb: Any): Any =
    new GenericArrayData(GeomOps.dump(wkb.asInstanceOf[Array[Byte]]).asInstanceOf[Array[Any]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, w =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) graft.core.GeomOps.dump($w))")
  override protected def withNewChildInternal(c: Expression): StDump = copy(child = c)
}

/** st_make_point(x, y) → point WKB. */
case class StMakePoint(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_make_point"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    graft.core.Wkb.writePoint(x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.core.Wkb.writePoint($x, $y)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StMakePoint =
    copy(left = l, right = r)
}

/** st_collect(array<wkb>) → multipolygon WKB collecting every polygon part
  * (no dissolve — parts may overlap; the Clip op's piece gatherer for
  * DISJOINT method layers). NULL elements skipped; empty → NULL. */
case class StCollect(child: Expression)
    extends Expression with ExpectsInputTypes with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(ArrayType(BinaryType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_collect"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val parts = scala.collection.mutable.ArrayBuffer.empty[Array[Array[Double]]]
    val lines = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val pts = scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = 0
    while (i < arr.numElements()) {
      val w = arr.getBinary(i)
      if (w != null) {
        val g = graft.core.Wkb.read(w)
        g.polygons.foreach(p => parts += p.rings)
        g.lines.foreach(l => lines += l)
        pts ++= g.points
      }
      i += 1
    }
    // highest-dimension member wins (the OGR GeometryCollection-flatten
    // convention for homogeneous collects)
    if (parts.length == 1) graft.core.Wkb.writePolygon(parts(0))
    else if (parts.nonEmpty) graft.core.Wkb.writeMultiPolygon(parts.toArray)
    else if (lines.nonEmpty) graft.core.Wkb.writeMultiLineString(lines.toArray)
    else if (pts.nonEmpty) graft.core.Wkb.writeMultiPoint(pts.toArray)
    else null
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): StCollect =
    StCollect(c(0))
}

/** st_area2_q(wkb, scale) → bigint: DOUBLE the polygon area in quantized
  * integer units — every vertex is rounded to long(round(coord·scale)) and
  * the shoelace runs in exact int64 arithmetic (outer |sum| minus hole
  * |sum|s, parts add). Order-free and engine-independent: any overlay
  * whose output coordinates are copies of quantized-consistent inputs
  * (box clips) yields EXACTLY additive areas, which is what the DuckDB
  * oracle rows compare. scale·|coord| must stay < ~3e8 to keep ring sums
  * inside int64 (1e6 over lon/lat is the intended use). */
case class StArea2Q(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_area2_q"
  override protected def nullSafeEval(wkb: Any, scale: Any): Any =
    GeomKernels.area2Q(wkb.asInstanceOf[Array[Byte]], scale.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, s) => s"graft.expr.GeomKernels.area2Q($w, $s)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StArea2Q =
    copy(left = l, right = r)
}

/** st_predicate(op, a, b) → boolean: the remaining OGR binary predicate
  * set over the overlay kernels (ogrgeometry.cpp Touches :6082, Crosses
  * :6155, Within :6262, Contains :6335, Overlaps :6409, Equals :1239):
  *  - within/contains: the difference kernel is empty (piece logic, not
  *    area thresholds);
  *  - overlaps: both remainders AND the intersection are non-empty;
  *  - touches: geometries meet (distance 0) but share no interior
  *    (empty areal intersection);
  *  - crosses: a linestring with points strictly inside AND strictly
  *    outside an areal geometry (polygon×polygon → false, per DE-9IM
  *    dimension rules);
  *  - equals: within both ways. */
case class StPredicate(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(StringType, BinaryType, BinaryType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_predicate"
  override protected def nullSafeEval(op: Any, a: Any, b: Any): Any =
    GeomKernels.predicate(op.toString, a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): StPredicate =
    copy(first = f, second = s, third = t)
}

/** Static kernels for codegen call sites. */
object GeomKernels {
  /** Exact intersects via envelope reject + min-distance == 0 (covers
    * crossing, touching, and either-way containment; holes honored by
    * the even-odd containment test inside distance). */
  def intersects(a: Array[Byte], b: Array[Byte]): Boolean = {
    val (ax0, ay0, ax1, ay1) = graft.core.Wkb.envelope(a)
    val (bx0, by0, bx1, by1) = graft.core.Wkb.envelope(b)
    if (!graft.core.Pip.bboxIntersects(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1)) false
    else GeomOps.distance(a, b) == 0.0
  }

  import graft.core.{Clip, Pip, Wkb}

  private def isAreal(g: Wkb.Geom): Boolean = g.polygons.nonEmpty

  /** a strictly covered by areal b (difference-empty piece logic; points
    * use direct containment). */
  private def within(a: Array[Byte], b: Array[Byte]): Boolean = {
    val ga = Wkb.read(a)
    val gb = Wkb.read(b)
    if (!isAreal(gb)) return false
    ga.geomType match {
      case Wkb.PointType => Pip.contains(b, ga.points(0), ga.points(1))
      case Wkb.LineStringType =>
        // every vertex and midpoint inside (exact for convex b; the
        // engine's line corpus is vertex-dense enough by construction)
        val pts = ga.points
        (0 until pts.length / 2).forall(i => Pip.contains(b, pts(2 * i), pts(2 * i + 1))) &&
          (0 until pts.length / 2 - 1).forall { i =>
            Pip.contains(b, (pts(2 * i) + pts(2 * i + 2)) / 2, (pts(2 * i + 1) + pts(2 * i + 3)) / 2)
          }
      case _ => Clip.difference(a, b).isEmpty
    }
  }

  def predicate(op: String, a: Array[Byte], b: Array[Byte]): Boolean = op match {
    case "within" => within(a, b)
    case "contains" => within(b, a)
    case "equals" => within(a, b) && within(b, a)
    case "overlaps" =>
      isAreal(Wkb.read(a)) && isAreal(Wkb.read(b)) &&
        Clip.intersection(a, b).nonEmpty &&
        Clip.difference(a, b).nonEmpty && Clip.difference(b, a).nonEmpty
    case "touches" =>
      if (!intersects(a, b)) false
      else {
        val ga = Wkb.read(a); val gb = Wkb.read(b)
        if (isAreal(ga) && isAreal(gb)) Clip.intersection(a, b).isEmpty
        else if (isAreal(gb) && ga.geomType == Wkb.PointType)
          !Pip.contains(b, ga.points(0), ga.points(1))
        else if (isAreal(ga) && gb.geomType == Wkb.PointType)
          !Pip.contains(a, gb.points(0), gb.points(1))
        else false
      }
    case "crosses" =>
      val ga = Wkb.read(a); val gb = Wkb.read(b)
      def lineCrossesAreal(line: Wkb.Geom, areal: Array[Byte]): Boolean = {
        val pts = line.points
        var in = false; var out = false
        var i = 0
        while (i < pts.length / 2) {
          if (Pip.contains(areal, pts(2 * i), pts(2 * i + 1))) in = true else out = true
          i += 1
        }
        in && out
      }
      if (ga.geomType == Wkb.LineStringType && isAreal(gb)) lineCrossesAreal(ga, b)
      else if (gb.geomType == Wkb.LineStringType && isAreal(ga)) lineCrossesAreal(gb, a)
      else false
    case other => throw new IllegalArgumentException(s"unknown predicate $other")
  }

  def centroidArr(wkb: Array[Byte]): ArrayData = {
    val (cx, cy) = GeomOps.centroid(wkb)
    new GenericArrayData(Array(cx, cy))
  }

  def area2Q(wkb: Array[Byte], scale: Double): Long = {
    val g = graft.core.Wkb.read(wkb)
    var total = 0L
    var p = 0
    while (p < g.polygons.length) {
      val rings = g.polygons(p).rings
      var r = 0
      while (r < rings.length) {
        val ring = rings(r)
        val n = ring.length / 2
        var s = 0L
        var i = 0
        while (i < n - 1) {
          val x0 = Math.round(ring(2 * i) * scale)
          val y0 = Math.round(ring(2 * i + 1) * scale)
          val x1 = Math.round(ring(2 * i + 2) * scale)
          val y1 = Math.round(ring(2 * i + 3) * scale)
          s += x0 * y1 - x1 * y0
          i += 1
        }
        val a = math.abs(s)
        total += (if (r == 0) a else -a)
        r += 1
      }
      p += 1
    }
    total
  }
}
