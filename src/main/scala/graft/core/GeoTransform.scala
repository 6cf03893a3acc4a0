package graft.core

/** Affine pixel→geo transform, semantics of GDAL's 6-coefficient
  * geotransform (reference: gcore/gdal_geotransform.h:41, Apply() :150):
  *   Xgeo = gt0 + px*gt1 + py*gt2
  *   Ygeo = gt3 + px*gt4 + py*gt5
  * Stored as a plain array<double>[6] column in DataFrames; this object is
  * the single pure-Scala implementation used by all Catalyst expressions.
  */
object GeoTransform {
  @inline def applyX(gt: Array[Double], px: Double, py: Double): Double =
    gt(0) + px * gt(1) + py * gt(2)

  @inline def applyY(gt: Array[Double], px: Double, py: Double): Double =
    gt(3) + px * gt(4) + py * gt(5)

  /** Invert the affine transform; returns None for degenerate (det=0). */
  def invert(gt: Array[Double]): Option[Array[Double]] = {
    val det = gt(1) * gt(5) - gt(2) * gt(4)
    if (det == 0.0) None
    else {
      val inv = 1.0 / det
      // Solve for pixel coords: p = A^-1 (g - origin)
      val i1 = gt(5) * inv
      val i2 = -gt(2) * inv
      val i4 = -gt(4) * inv
      val i5 = gt(1) * inv
      val i0 = -(i1 * gt(0) + i2 * gt(3))
      val i3 = -(i4 * gt(0) + i5 * gt(3))
      Some(Array(i0, i1, i2, i3, i4, i5))
    }
  }

  /** Geo envelope of a w×h raster under gt (axis-aligned bound of the 4
    * corners — handles rotated transforms too). */
  def envelope(gt: Array[Double], w: Int, h: Int): (Double, Double, Double, Double) = {
    val xs = Array(applyX(gt, 0, 0), applyX(gt, w, 0), applyX(gt, 0, h), applyX(gt, w, h))
    val ys = Array(applyY(gt, 0, 0), applyY(gt, w, 0), applyY(gt, 0, h), applyY(gt, w, h))
    (xs.min, ys.min, xs.max, ys.max)
  }
}
