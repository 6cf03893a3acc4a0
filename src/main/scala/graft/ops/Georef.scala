package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{GcpPoly, GeoLoc, Homography, Rpc, Tps}
import graft.expr.{GcpPolyEval, GeoLocEval, HomographyEval, RpcEval, TpsEval}
import org.apache.spark.sql.graft.Bridge.{column => toCol, expression => toExpr}

/** DataFrame surface for the GCP transformer family (alg/gdal_crs.cpp,
  * thinplatespline.cpp, gdal_rpc.cpp; SURVEY.md §2.8 transformers).
  *
  * Shape at scale: the GCP layer is collected on the driver (guarded —
  * control-point lists are O(10²) by nature, like the reference's
  * in-memory GCP arrays) and fitted ONCE; the fitted coefficients ride
  * broadcast inside a codegen'd expression, so transforming a 10¹¹-row
  * point layer is an embarrassingly parallel map with no shuffle. */
object Georef {

  /** Hard cap on collected control points — a GCP set is not a layer.
    * (The reference's transformers hold all GCPs in one malloc'd array;
    * gdal_crs.cpp worst-case solves are O(n·c²) on one thread.) */
  val MaxGcps = 100000

  private def collect4(gcps: DataFrame, c1: String, c2: String, c3: String, c4: String)
      : (Array[Double], Array[Double], Array[Double], Array[Double]) = {
    val rows = gcps.select(
      col(c1).cast("double"), col(c2).cast("double"),
      col(c3).cast("double"), col(c4).cast("double")).limit(MaxGcps + 1).collect()
    require(rows.length <= MaxGcps,
      s"Georef: GCP side exceeds $MaxGcps rows — control points must be a small driver-side set")
    (rows.map(_.getDouble(0)), rows.map(_.getDouble(1)),
      rows.map(_.getDouble(2)), rows.map(_.getDouble(3)))
  }

  /** Fit forward+inverse polynomials from a GCP frame with columns
    * (px, py, gx, gy). */
  def fitGcpPoly(gcps: DataFrame, order: Int,
                 pxCol: String = "px", pyCol: String = "py",
                 gxCol: String = "gx", gyCol: String = "gy"): GcpPoly.Both = {
    val (px, py, gx, gy) = collect4(gcps, pxCol, pyCol, gxCol, gyCol)
    GcpPoly.fitBoth(px, py, gx, gy, order)
  }

  /** Outlier-rejecting GCP fit keyed by an id column: surviving/dropped
    * GCP ids plus the final two-direction fit. */
  final case class RefinedGcps(keptIds: Array[Long], droppedIds: Array[Long],
                               both: GcpPoly.Both)

  /** `gdalwarp -refine_gcps tolerance [min_gcps]` —
    * GDALCreateGCPRefineTransformer (alg/gdal_crs.cpp:365): iteratively
    * drop the worst-residual GCP at or above `tolerance` and refit, until
    * none clears it or only `minimumGcps` remain (see GcpPoly.refine for
    * the mirrored loop). Driver-side like every GCP fit here — the
    * refined coefficients then ride codegen'd expressions over any point
    * layer. */
  def refineGcpPoly(gcps: DataFrame, order: Int, tolerance: Double,
                    minimumGcps: Int = -1, idCol: String = "id",
                    pxCol: String = "px", pyCol: String = "py",
                    gxCol: String = "gx", gyCol: String = "gy"): RefinedGcps = {
    val rows = gcps.select(
      col(idCol).cast("long"), col(pxCol).cast("double"), col(pyCol).cast("double"),
      col(gxCol).cast("double"), col(gyCol).cast("double")).limit(MaxGcps + 1).collect()
    require(rows.length <= MaxGcps,
      s"Georef: GCP side exceeds $MaxGcps rows — control points must be a small driver-side set")
    val ids = rows.map(_.getLong(0))
    val r = GcpPoly.refine(
      rows.map(_.getDouble(1)), rows.map(_.getDouble(2)),
      rows.map(_.getDouble(3)), rows.map(_.getDouble(4)),
      order, tolerance, minimumGcps)
    RefinedGcps(r.kept.map(ids), r.dropped.map(ids), r.both)
  }

  /** Fit forward+inverse thin plate splines from a GCP frame. */
  def fitTps(gcps: DataFrame,
             pxCol: String = "px", pyCol: String = "py",
             gxCol: String = "gx", gyCol: String = "gy"): Tps.Both = {
    val (px, py, gx, gy) = collect4(gcps, pxCol, pyCol, gxCol, gyCol)
    Tps.fitBoth(px, py, gx, gy)
  }

  /** GDALGCPsToGeoTransform over a GCP frame: order-1 fit as an affine
    * geotransform usable by the warp/tiling operators. */
  def gcpsToGeoTransform(gcps: DataFrame,
                         pxCol: String = "px", pyCol: String = "py",
                         gxCol: String = "gx", gyCol: String = "gy"): Option[Array[Double]] = {
    val (px, py, gx, gy) = collect4(gcps, pxCol, pyCol, gxCol, gyCol)
    GcpPoly.gcpsToGeoTransform(px, py, gx, gy)
  }

  /** [tx, ty] column from a fitted polynomial direction. */
  def gcpPolyTransform(fit: GcpPoly.Fit, x: Column, y: Column): Column =
    toCol(GcpPolyEval(toExpr(x), toExpr(y), fit))

  /** GDALGCPsToHomography + GDALInvHomography over a GCP frame: the
    * forward least-squares projective fit and its exact inverse
    * (alg/gdal_homography.cpp). Throws on degenerate GCP geometry. */
  def fitHomography(gcps: DataFrame,
                    pxCol: String = "px", pyCol: String = "py",
                    gxCol: String = "gx", gyCol: String = "gy"): Homography.Both = {
    val (px, py, gx, gy) = collect4(gcps, pxCol, pyCol, gxCol, gyCol)
    Homography.fitBoth(px, py, gx, gy).getOrElse(
      throw new IllegalArgumentException(
        "Georef.fitHomography: degenerate GCP geometry or non-convex fit"))
  }

  /** [tx, ty] column through a 9-coefficient homography direction. */
  def homographyTransform(h: Array[Double], x: Column, y: Column): Column =
    toCol(HomographyEval(toExpr(x), toExpr(y), h))

  /** [geoX, geoY] from raster (pixel, line) through a geolocation-array
    * transformer (alg/gdalgeoloc.cpp bilinear interpolation). */
  def geolocForward(g: GeoLoc, p: Column, l: Column): Column =
    toCol(GeoLocEval(toExpr(p), toExpr(l), g, inverse = false))

  /** [pixel, line] from (geoX, geoY) — exact inverse bilinear solve;
    * [NaN, NaN] outside the geolocation grid's image. */
  def geolocInverse(g: GeoLoc, x: Column, y: Column): Column =
    toCol(GeoLocEval(toExpr(x), toExpr(y), g, inverse = true))

  /** [tx, ty] column from a fitted TPS direction. */
  def tpsTransform(fit: Tps.Fit, x: Column, y: Column): Column =
    toCol(TpsEval(toExpr(x), toExpr(y), fit))

  /** [pixel, line] from (lon, lat, h) through an RPC model. */
  def rpcForward(model: Rpc, lon: Column, lat: Column, h: Column): Column =
    toCol(RpcEval(toExpr(lon), toExpr(lat), toExpr(h), model, inverse = false))

  /** [lon, lat] from (pixel, line, h) through an RPC model (iterative). */
  def rpcInverse(model: Rpc, px: Column, py: Column, h: Column): Column =
    toCol(RpcEval(toExpr(px), toExpr(py), toExpr(h), model, inverse = true))
}
