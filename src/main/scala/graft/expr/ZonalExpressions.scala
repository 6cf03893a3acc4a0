package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import graft.core._

/** zone_stats_full(bytes, fmt, meta9, zoneWkb, weightsBand) → the complete
  * zonal-statistics record of band-0 pixels whose centers fall inside the
  * zone polygon (reference stat list: apps/gdalalg_raster_zonal_stats.cpp:
  * 64-72 — count/min/max/mean/median/minority/mode(majority)/stdev/sum/
  * variety/variance/center_x/center_y/min_center/max_center/weighted_*).
  *
  * Definitions (exactextract-compatible):
  *  - median: quantile(0.5) with linear interpolation ⇒ odd n → middle,
  *    even n → mean of the two middles (same as DuckDB median over ints);
  *  - majority/minority: most/least frequent value, ties → lowest value;
  *  - stdev/variance: POPULATION (sum2/n − mean²);
  *  - center_x/y: mean of covered pixel-center geo coordinates, computed
  *    from exact integer index sums (order-free, oracle-comparable);
  *  - min/max_center: center of the FIRST (row-major) min/max pixel;
  *  - weighted_*: weights from band `weightsBand` (NULL when the band
  *    doesn't exist), binary center-rule coverage (the DEFAULT pixel-
  *    intersection mode; FRACTIONAL coverage is not implemented).
  *
  * NULL when no pixel center falls in the zone. Determinism: every
  * accumulator is exact int64; doubles derive from them with a fixed IEEE
  * op order mirrored by the oracle SQL.
  */
case class ZoneStatsFull(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 5, "zone_stats_full(bytes, fmt, meta9, zone_wkb, weights_band)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(BinaryType, StringType, ArrayType(DoubleType), BinaryType, IntegerType)
  override def dataType: DataType = StructType(Seq(
    StructField("count", LongType, nullable = false),
    StructField("vmin", IntegerType, nullable = false),
    StructField("vmax", IntegerType, nullable = false),
    StructField("sum", LongType, nullable = false),
    StructField("mean", DoubleType, nullable = false),
    StructField("median", DoubleType, nullable = false),
    StructField("majority", IntegerType, nullable = false),
    StructField("minority", IntegerType, nullable = false),
    StructField("variety", IntegerType, nullable = false),
    StructField("stdev", DoubleType, nullable = false),
    StructField("variance", DoubleType, nullable = false),
    StructField("center_x", DoubleType, nullable = false),
    StructField("center_y", DoubleType, nullable = false),
    StructField("min_cx", DoubleType, nullable = false),
    StructField("min_cy", DoubleType, nullable = false),
    StructField("max_cx", DoubleType, nullable = false),
    StructField("max_cy", DoubleType, nullable = false),
    StructField("wsum", LongType, nullable = true),
    StructField("wmean", DoubleType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "zone_stats_full"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.take(4).exists(_ == null)) return null
    val meta = vals(2).asInstanceOf[ArrayData].toDoubleArray()
    val weightsBand = if (vals(4) == null) -1 else vals(4).asInstanceOf[Int]
    ZonalKernels.zoneStatsFull(vals(0).asInstanceOf[Array[Byte]], vals(1).toString,
      meta, vals(3).asInstanceOf[Array[Byte]], weightsBand)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ZoneStatsFull =
    copy(children = c)
}

object ZonalKernels {

  def zoneStatsFull(bytes: Array[Byte], fmt: String, meta: Array[Double],
                    zoneWkb: Array[Byte], weightsBand: Int): Any = {
    val w = meta(0).toInt; val h = meta(1).toInt
    val gt = java.util.Arrays.copyOfRange(meta, 3, 9)
    val src = ImageCodec.decode(bytes, fmt, w, h)
    val mask = Rasterize.rasterize(w, h, gt, Seq((zoneWkb, 1)))
    val b0 = src.bands(0)
    val wb = if (weightsBand >= 0 && weightsBand < src.nBands) src.bands(weightsBand) else null

    val hist = new Array[Long](256)
    var count = 0L
    var sum = 0L
    var sum2 = 0L
    var sumX = 0L
    var sumY = 0L
    var vmin = Int.MaxValue; var vmax = Int.MinValue
    var minIdx = -1; var maxIdx = -1
    var wsum = 0L; var wwsum = 0L
    var i = 0
    while (i < b0.length) {
      if (mask(i) != 0) {
        val v = b0(i)
        count += 1
        sum += v
        sum2 += v.toLong * v
        hist(v & 0xFF) += 1
        sumX += i % w
        sumY += i / w
        if (v < vmin) { vmin = v; minIdx = i }
        if (v > vmax) { vmax = v; maxIdx = i }
        if (wb != null) { wsum += v.toLong * wb(i); wwsum += wb(i) }
      }
      i += 1
    }
    if (count == 0) return null

    // median: quantile(0.5) over the 256-bin histogram
    val half = count / 2
    val median: Double =
      if (count % 2 == 1) histNth(hist, half).toDouble
      else (histNth(hist, half - 1) + histNth(hist, half)) / 2.0

    var majority = -1; var majorityN = -1L
    var minority = -1; var minorityN = Long.MaxValue
    var variety = 0
    var v = 0
    while (v < 256) {
      val n = hist(v)
      if (n > 0) {
        variety += 1
        if (n > majorityN) { majorityN = n; majority = v }
        if (n < minorityN) { minorityN = n; minority = v }
      }
      v += 1
    }

    val nd = count.toDouble
    val mean = sum.toDouble / nd
    val variance = (sum2.toDouble / nd) - (mean * mean)
    val stdev = math.sqrt(variance)

    @inline def centerX(px: Double): Double = gt(0) + ((px + 0.5) * gt(1))
    @inline def centerY(py: Double): Double = gt(3) + ((py + 0.5) * gt(5))
    val cx = centerX(sumX.toDouble / nd)
    val cy = centerY(sumY.toDouble / nd)

    org.apache.spark.sql.catalyst.InternalRow(
      count, vmin, vmax, sum, mean, median, majority, minority, variety,
      stdev, variance, cx, cy,
      centerX((minIdx % w).toDouble), centerY((minIdx / w).toDouble),
      centerX((maxIdx % w).toDouble), centerY((maxIdx / w).toDouble),
      if (wb == null) null else wsum,
      if (wb == null || wwsum == 0) null else wsum.toDouble / wwsum.toDouble)
  }

  /** Value at sorted position `k` (0-based) of a histogram. */
  private def histNth(hist: Array[Long], k: Long): Int = {
    var acc = 0L
    var v = 0
    while (v < 256) {
      acc += hist(v)
      if (acc > k) return v
      v += 1
    }
    255
  }
}
