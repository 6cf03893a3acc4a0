package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Embedding-similarity kernels (SURVEY.md §2.11). The quantized dot
  * product is THE hot inner loop of every verify/scoring stage (q44 brute
  * top-k, q50 ANN verify, q99 IVF ranking, q105 cosine near-dup): the
  * original zip_with/aggregate HOF formulation is correct but evaluated
  * interpreted (Spark's higher-order functions carry no doGenCode) with a
  * per-row lambda allocation per element — a codegen'd expression does the
  * same arithmetic in a tight primitive loop.
  */
object AnnKernels {
  /** = ops.Ann.Scale; 2^20 as a double so every multiply stays exact for
    * float inputs (24-bit mantissas → 48-bit products × a power of two). */
  val Scale = 1048576.0

  /** Σ_d round(a_d · b_d · 2^20) over float arrays, the round being
    * half-AWAY-FROM-ZERO — bit-identical to the SQL formulation
    * `aggregate(zip_with(a, b, (x,y) -> cast(round(x*y*Scale) as bigint)), 0L, +)`
    * (Spark's Round = BigDecimal HALF_UP; DuckDB's = C std::round): for
    * this input class v = float·float·2^20 has ≤48 mantissa bits, so
    * |v|+0.5 is exact whenever an integer decision boundary is near and
    * the floor comparison below reproduces both engines' behavior
    * exactly, ties included. */
  def quantizedDot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"quantized_dot: length mismatch ($n vs ${b.numElements()})")
    var i = 0
    var s = 0L
    while (i < n) {
      val v = a.getFloat(i).toDouble * b.getFloat(i).toDouble * Scale
      val av = java.lang.Math.abs(v)
      val f = java.lang.Math.floor(av)
      val r = if (av - f >= 0.5) f.toLong + 1L else f.toLong
      s += (if (v < 0) -r else r)
      i += 1
    }
    s
  }

  /** Exact int64 dot of two already-quantized component arrays (the
    * qx-domain of QuantizeEmb / vec_sum outputs). */
  def intDot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"int_dot: length mismatch ($n vs ${b.numElements()})")
    var i = 0
    var s = 0L
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }
}

/** Product-quantization model: per-subspace codebooks over coarse-cell
  * residuals (the IndexIVFPQ layout). All constants are driver-built and
  * broadcast-referenced; `qn(s)(c)` caches Σ_i round(cb²·Scale) with the
  * same component rounding as the distances so the argmin algebra is
  * exact int64 end to end. */
final case class PqModel(cents: Map[Int, Array[Float]],
                         cb: Array[Array[Array[Float]]],
                         qn: Array[Array[Long]],
                         m: Int, dsub: Int) extends Serializable

object PqKernels {
  /** Round half away from zero — the quantizedDot decision rule. */
  @inline def qround(v: Double): Long = {
    val av = java.lang.Math.abs(v)
    val f = java.lang.Math.floor(av)
    val r = if (av - f >= 0.5) f.toLong + 1L else f.toLong
    if (v < 0) -r else r
  }

  /** PQ codes of the residual (emb − centroid[cell]): per subspace the
    * argmin over codebook entries of the reduced quantized L2
    * qn(s)(c) − 2·Σ_i round(resid_i·cb_i·Scale), ties to the lowest
    * code — exact int64, SQL-mirrorable. */
  def encode(model: AnyRef, emb: ArrayData, cell: Int): ArrayData = {
    val pq = model.asInstanceOf[PqModel]
    val cent = pq.cents(cell)
    val codes = new Array[Int](pq.m)
    var s = 0
    while (s < pq.m) {
      var best = 0L; var bestC = -1
      var c = 0
      while (c < pq.cb(s).length) {
        var dot = 0L
        var i = 0
        while (i < pq.dsub) {
          val gi = s * pq.dsub + i
          val resid = emb.getFloat(gi).toDouble - cent(gi).toDouble
          dot += qround(resid * pq.cb(s)(c)(i).toDouble * AnnKernels.Scale)
          i += 1
        }
        val d = pq.qn(s)(c) - 2L * dot
        if (bestC == -1 || d < best) { best = d; bestC = c }
        c += 1
      }
      codes(s) = bestC
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  /** ADC score: Σ_s lut(s)(codes(s)) — pure int64 adds per row. */
  def adc(codes: ArrayData, lut: ArrayData): Long = {
    var s = 0L
    var i = 0
    val n = codes.numElements()
    while (i < n) {
      s += lut.getArray(i).getLong(codes.getInt(i))
      i += 1
    }
    s
  }
}

/** pq_encode(emb, cell) with a driver-built PqModel → array<int> codes. */
case class PqEncode(left: Expression, right: Expression, model: PqModel)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(ArrayType(FloatType), IntegerType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"
  override protected def nullSafeEval(a: Any, c: Any): Any =
    PqKernels.encode(model, a.asInstanceOf[ArrayData], c.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqModel", model, "java.lang.Object")
    defineCodeGen(ctx, ev, (a, c) => s"graft.expr.PqKernels.encode($ref, $a, $c)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
    copy(left = l, right = r)
}

/** pq_adc(codes, lut) → Σ_s lut[s][codes[s]] as bigint. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(ArrayType(IntegerType), ArrayType(ArrayType(LongType)))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqKernels.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.PqKernels.adc($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}

/** quantized_dot(a, b) → Σ round(a_d·b_d·2^20) as bigint; float arrays. */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantized_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    AnnKernels.quantizedDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.AnnKernels.quantizedDot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantizedDot =
    copy(left = l, right = r)
}

/** int_dot(a, b) over array<bigint> columns — the exact int64 companion
  * of quantized_dot for frames already in the quantized component domain
  * (QuantizeEmb vectors, vec_sum centroid sums). Codegen'd: stays inside
  * whole-stage codegen like the float variant. */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    AnnKernels.intDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.AnnKernels.intDot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntDot =
    copy(left = l, right = r)
}

/** k-means coarse-quantizer model: k int64-quantized centroids (row j =
  * centroid j's components, qx-domain) with cached squared norms so the
  * per-row argmin is qn(j) − 2·qx·c_j — the reduced L2 of the IVF
  * assignment (`Ann.ivfCell`) carried into the quantized-component
  * domain, where Lloyd's update (floorDiv of component sums) is ALSO
  * exact int64 and therefore SQL-mirrorable end to end. */
final case class KmeansModel(cents: Array[Array[Long]]) extends Serializable {
  val qn: Array[Long] = cents.map { c =>
    var s = 0L; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }; s
  }
}

object KmeansKernels {
  /** Component quantization qx_i = round(v_i·2^20), half away from zero —
    * v·2^20 is EXACT for float v (24-bit mantissa × a power of two), so
    * the tie set is exactly the dyadics with fractional part .5 and both
    * engines (Spark Round = BigDecimal HALF_UP, DuckDB = C std::round)
    * agree on every component. */
  def quantize(emb: ArrayData): ArrayData = {
    val n = emb.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = PqKernels.qround(emb.getFloat(i).toDouble * AnnKernels.Scale)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** argmin_j qn(j) − 2·qx·c_j, ties to the LOWEST j (strict `<` keeps
    * the first minimum) → [bestJ, bestDist] so one pass yields both the
    * assignment and its reduced distance (the per-cluster inertia term).
    * Bounds: |qx_i|,|c_i| ≤ 2^21 ⇒ |dot| ≤ d·2^42 — int64-safe to
    * d ≈ 2^20 components. */
  def assign(model: AnyRef, qx: ArrayData): ArrayData = {
    val m = model.asInstanceOf[KmeansModel]
    var best = 0L; var bestJ = -1
    var j = 0
    while (j < m.cents.length) {
      val c = m.cents(j)
      var dot = 0L; var i = 0
      while (i < c.length) { dot += qx.getLong(i) * c(i); i += 1 }
      val d = m.qn(j) - 2L * dot
      if (bestJ == -1 || d < best) { best = d; bestJ = j }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(bestJ.toLong, best))
  }
}

/** Elementwise sum of long-array columns (the k-means update's Σ qx per
  * cluster as ONE aggregate — d separate sum(element_at) expressions cost
  * ~12 s of first-compile whole-stage codegen at d=64 and scale the
  * generated source with d; this buffer is the same k×d longs with O(1)
  * generated code). Empty buffer = identity, so clusters never see a
  * length mismatch; merge is commutative + associative (map-side combine
  * safe). */
object VecSumAgg extends org.apache.spark.sql.expressions.Aggregator[Array[Long], Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], x: Array[Long]): Array[Long] = merge(buf, x)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return if (b.isEmpty) a else b.clone()
    if (b.isEmpty) return a
    require(a.length == b.length, s"vec_sum dimension mismatch ${a.length} vs ${b.length}")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** quantize_emb(emb) → array<bigint> of round(v·2^20) per component. */
case class QuantizeEmb(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantize_emb"
  override protected def nullSafeEval(a: Any): Any =
    KmeansKernels.quantize(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.KmeansKernels.quantize($a)")
  override protected def withNewChildInternal(c: Expression): QuantizeEmb =
    copy(child = c)
}

/** kmeans_assign(qx) with a driver-built KmeansModel →
  * array<bigint> [cell, reduced-distance]. */
case class KmeansAssign(child: Expression, model: KmeansModel)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kmeans_assign"
  override protected def nullSafeEval(a: Any): Any =
    KmeansKernels.assign(model, a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kmModel", model, "java.lang.Object")
    defineCodeGen(ctx, ev, a => s"graft.expr.KmeansKernels.assign($ref, $a)")
  }
  override protected def withNewChildInternal(c: Expression): KmeansAssign =
    copy(child = c)
}

/** nearest_site_strict(px, py) over a driver-collected site array
  * (broadcast into codegen like the GCP fits): true iff the probe's
  * int64 argmin site is UNIQUE — i.e. its second-nearest distance is
  * strictly greater. Replaces the 45M-row crossJoin + per-probe window
  * the Voronoi strictness filter first shipped with: one O(|sites|)
  * register loop per probe, map-only, no shuffle. Sites are capped by
  * the caller (the same guarded-collect contract as pipJoinIndexed).
  */
object SiteKernels {
  /** packed = [sx0, sy0, sx1, sy1, …] to keep the reference object flat. */
  def strictNearest(packed: Array[Long], px: Long, py: Long): Boolean = {
    var best = Long.MaxValue
    var second = Long.MaxValue
    var i = 0
    while (i < packed.length) {
      val dx = px - packed(i)
      val dy = py - packed(i + 1)
      val d2 = dx * dx + dy * dy
      if (d2 < best) { second = best; best = d2 }
      else if (d2 < second) { second = d2 }
      i += 2
    }
    second > best
  }
}

case class NearestSiteStrict(left: Expression, right: Expression, packedSites: Array[Long])
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(LongType, LongType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_site_strict"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    SiteKernels.strictNearest(packedSites, x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("packedSites", packedSites, "long[]")
    defineCodeGen(ctx, ev, (x, y) => s"graft.expr.SiteKernels.strictNearest($ref, $x, $y)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestSiteStrict =
    copy(left = l, right = r)
}
