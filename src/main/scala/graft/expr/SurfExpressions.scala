package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import graft.core.{ImageCodec, SimpleSurf}

/** SURF correlator expressions (alg/gdal_simplesurf.cpp, gdal_octave.cpp,
  * gdalmatching.cpp). Extraction is a per-row kernel over the image
  * corpus; matching runs on candidate pairs AFTER a join — at corpus
  * scale candidate pairs come from the phash/banding dedup operators,
  * never from an all-pairs product. */
object SurfExpressions {
  val PointType: StructType = StructType(Seq(
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("scale", IntegerType, nullable = false),
    StructField("sign", IntegerType, nullable = false),
    StructField("desc", ArrayType(DoubleType, containsNull = false), nullable = false)))

  val MatchType: StructType = StructType(Seq(
    StructField("x1", IntegerType, nullable = false),
    StructField("y1", IntegerType, nullable = false),
    StructField("x2", IntegerType, nullable = false),
    StructField("y2", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false)))

  def toRows(pts: Array[SimpleSurf.FeaturePoint]): ArrayData =
    new GenericArrayData(pts.map(p => InternalRow(p.x, p.y, p.scale, p.sign.toInt,
      new GenericArrayData(p.desc)): Any))

  def fromRows(a: ArrayData): Array[SimpleSurf.FeaturePoint] =
    Array.tabulate(a.numElements()) { i =>
      val r = a.getStruct(i, 5)
      SimpleSurf.FeaturePoint(r.getInt(0), r.getInt(1), r.getInt(2), 0,
        r.getInt(3), r.getArray(4).toDoubleArray())
    }
}

/** surf_points(bytes, fmt, w, h, octave_start, octave_end, threshold) →
  * array<struct<x, y, scale, sign, desc>> — Fast-Hessian feature points
  * with 64-d Haar descriptors (GDALSimpleSURF::ExtractFeaturePoints). */
case class SurfPoints(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 7, "surf_points(bytes, fmt, w, h, oct_start, oct_end, threshold)")
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, StringType, IntegerType, IntegerType, IntegerType, IntegerType, DoubleType)
  override def dataType: DataType = ArrayType(SurfExpressions.PointType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "surf_points"

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val w = vals(2).asInstanceOf[Int]; val h = vals(3).asInstanceOf[Int]
    val r = ImageCodec.decode(vals(0).asInstanceOf[Array[Byte]], vals(1).toString, w, h)
    val lum = SimpleSurf.luminosity(r.bands, w, h)
    val pts = SimpleSurf.extract(new SimpleSurf.Integral(lum, w, h),
      vals(4).asInstanceOf[Int], vals(5).asInstanceOf[Int], vals(6).asInstanceOf[Double])
    SurfExpressions.toRows(pts)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SurfPoints =
    copy(children = c)
}

/** surf_match(points_a, points_b, match_threshold) →
  * array<struct<x1, y1, x2, y2, dist>> — greedy sign-gated NN matching
  * with the 0.8 ratio test and max-normalized distance pruning
  * (GDALSimpleSURF::MatchFeaturePoints). */
case class SurfMatch(children: Seq[Expression]) extends Expression with ExpectsInputTypes with CodegenFallback {
  require(children.length == 3, "surf_match(points_a, points_b, match_threshold)")
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(SurfExpressions.PointType, containsNull = false),
      ArrayType(SurfExpressions.PointType, containsNull = false), DoubleType)
  override def dataType: DataType = ArrayType(SurfExpressions.MatchType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "surf_match"

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val a = SurfExpressions.fromRows(vals(0).asInstanceOf[ArrayData])
    val b = SurfExpressions.fromRows(vals(1).asInstanceOf[ArrayData])
    val pairs = SimpleSurf.matchPoints(a, b, vals(2).asInstanceOf[Double])
    new GenericArrayData(pairs.map { case (i, j, d) =>
      InternalRow(a(i).x, a(i).y, b(j).x, b(j).y, d): Any
    })
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SurfMatch =
    copy(children = c)
}
