package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import graft.core._

/** Per-image quality signals for corpus filtering — the image analog of
  * the Gopher text rules (§2.11): a training-data pipeline drops or
  * down-weights blurry, under/over-exposed, and clipped images before
  * they cost GPU time. No reference analog (GDAL computes generic band
  * stats); the signal set follows the standard curation recipe:
  *
  *  - blur: sum and sum-of-squares of the 4-neighbour Laplacian
  *    L = 4v − v(x−1,y) − v(x+1,y) − v(x,y−1) − v(x,y+1) over INTERIOR
  *    pixels ("variance of Laplacian" — derive it exactly downstream as
  *    (n·ΣL² − (ΣL)²) / n²; the expression returns the integer moments so
  *    every engine computes the same numbers),
  *  - exposure/contrast: integer Σv and Σv² over the full band,
  *  - clipping: counts of near-black (v ≤ 1) and near-white (v ≥ 254)
  *    pixels.
  *
  * Band 1 only, like the other per-image kernels here (fixture bands are
  * replicas). All fields are exact int64 — fully SQL-mirrorable (q145).
  * CodegenFallback: per-row cost is the decode, as with every raster
  * kernel in this package.
  */
case class RasterQuality(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 4, "raster_quality(bytes, fmt, w, h)")
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, StringType, IntegerType, IntegerType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_int", LongType, nullable = false),
    StructField("lap_sum", LongType, nullable = false),
    StructField("lap_sum2", LongType, nullable = false),
    StructField("n_lo", LongType, nullable = false),
    StructField("n_hi", LongType, nullable = false),
    StructField("v_sum", LongType, nullable = false),
    StructField("v_sum2", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "raster_quality"

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val w = vals(2).asInstanceOf[Int]; val h = vals(3).asInstanceOf[Int]
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    val b = r.bands(0)
    var lapSum = 0L; var lapSum2 = 0L
    var nLo = 0L; var nHi = 0L; var vSum = 0L; var vSum2 = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = b(y * w + x)
        vSum += v; vSum2 += v.toLong * v
        if (v <= 1) nLo += 1
        if (v >= 254) nHi += 1
        if (x > 0 && x < w - 1 && y > 0 && y < h - 1) {
          val lap = 4L * v - b(y * w + x - 1) - b(y * w + x + 1) -
            b((y - 1) * w + x) - b((y + 1) * w + x)
          lapSum += lap
          lapSum2 += lap * lap
        }
        x += 1
      }
      y += 1
    }
    val nInt = if (w > 2 && h > 2) (w - 2).toLong * (h - 2) else 0L
    InternalRow(nInt, lapSum, lapSum2, nLo, nHi, vSum, vSum2)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): RasterQuality =
    copy(children = newChildren)
}
