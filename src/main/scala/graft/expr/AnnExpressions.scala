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
