package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import graft.core.{GcpPoly, GeoLoc, Homography, Rpc, Tps}

/** GCP transformer expressions (alg/gdal_crs.cpp, thinplatespline.cpp,
  * gdal_rpc.cpp). The fitted coefficient payload rides the expression via
  * `ctx.addReferenceObj` — the fit happens once on the driver (GCP counts
  * are O(10²)); the per-row work is pure codegen'd arithmetic. */
object GeorefEval {
  def gcp(fit: AnyRef, x: Double, y: Double): ArrayData = {
    val (tx, ty) = fit.asInstanceOf[GcpPoly.Fit](x, y)
    new GenericArrayData(Array(tx, ty))
  }

  def tps(fit: AnyRef, x: Double, y: Double): ArrayData = {
    val (tx, ty) = fit.asInstanceOf[Tps.Fit](x, y)
    new GenericArrayData(Array(tx, ty))
  }

  def rpcFwd(model: AnyRef, lon: Double, lat: Double, h: Double): ArrayData = {
    val (px, py) = Rpc.forward(model.asInstanceOf[Rpc], lon, lat, h)
    new GenericArrayData(Array(px, py))
  }

  def rpcInv(model: AnyRef, px: Double, py: Double, h: Double): ArrayData = {
    val (lon, lat) = Rpc.inverse(model.asInstanceOf[Rpc], px, py, h)
    new GenericArrayData(Array(lon, lat))
  }

  def homography(h: AnyRef, x: Double, y: Double): ArrayData = {
    val (tx, ty) = Homography.apply(h.asInstanceOf[Array[Double]], x, y)
    new GenericArrayData(Array(tx, ty))
  }

  def geolocFwd(g: AnyRef, p: Double, l: Double): ArrayData = {
    val (x, y) = g.asInstanceOf[GeoLoc].forward(p, l)
    new GenericArrayData(Array(x, y))
  }

  def geolocInv(g: AnyRef, x: Double, y: Double): ArrayData =
    g.asInstanceOf[GeoLoc].inverse(x, y) match {
      case Some((p, l)) => new GenericArrayData(Array(p, l))
      case None => new GenericArrayData(Array(Double.NaN, Double.NaN))
    }
}

/** gcp_to_gt(pxs, pys, gxs, gys) → 6-element affine geotransform fitted
  * from PER-ROW control points (GDALGCPsToGeoTransform over a dataset's
  * own GCP list — the tile-index/raster-ingest shape, where every raster
  * carries its own control points). NULL when under-determined. */
case class GcpToGt(children: Seq[Expression])
    extends Expression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(children.length == 4, "gcp_to_gt(pxs, pys, gxs, gys)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq.fill(4)(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gcp_to_gt"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val arrs = vals.map(_.asInstanceOf[ArrayData].toDoubleArray())
    if (arrs.exists(_.length != arrs.head.length)) return null
    // degenerate per-row GCP sets (collinear/duplicate points make the
    // order-1 solve singular) yield NULL, matching the n<2 path
    try GcpPoly.gcpsToGeoTransform(arrs(0), arrs(1), arrs(2), arrs(3))
      .map(new GenericArrayData(_)).orNull
    catch { case _: IllegalArgumentException => null }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): GcpToGt =
    copy(children = c)
}

/** tps_to_gt(pxs, pys, gxs, gys) → 6-element affine geotransform derived
  * from a PER-ROW thin-plate-spline fit over the row's control points
  * (GDALCreateGenImgProjTransformer2's TPS branch,
  * alg/gdaltransformer.cpp:2497, driven into the warp path): the TPS is
  * fitted exactly through the GCPs (thinplatespline.cpp solve), then the
  * affine map is read off by evaluating it at (0,0), (1,0), (0,1). On
  * affine-consistent GCPs the interpolating TPS has zero RBF weights, so
  * the derived gt IS the affine map to solver precision — which is what
  * makes the q31 tile-structure oracle applicable end-to-end (q159).
  * NULL on degenerate control points (singular system / n < 3). */
case class TpsToGt(children: Seq[Expression])
    extends Expression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(children.length == 4, "tps_to_gt(pxs, pys, gxs, gys)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq.fill(4)(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "tps_to_gt"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val arrs = vals.map(_.asInstanceOf[ArrayData].toDoubleArray())
    if (arrs.exists(_.length != arrs.head.length)) return null
    try {
      val tps = Tps.fit(arrs(0), arrs(1), arrs(2), arrs(3))
      val (x00, y00) = tps(0.0, 0.0)
      val (x10, y10) = tps(1.0, 0.0)
      val (x01, y01) = tps(0.0, 1.0)
      new GenericArrayData(Array(x00, x10 - x00, x01 - x00, y00, y10 - y00, y01 - y00))
    } catch { case _: IllegalArgumentException => null }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TpsToGt =
    copy(children = c)
}

/** rpc_refit_gt(gt, w, h) → 6-element affine geotransform recovered by
  * driving a PER-ROW RPC model through the reference's iterative inverse
  * (the RPC branch of GDALCreateGenImgProjTransformer2,
  * alg/gdaltransformer.cpp:2527, feeding gdalwarpoperation): the row's
  * affine map is encoded as a rational-polynomial model (linear numerator
  * terms over a constant denominator, normalized to the image footprint —
  * the shape a vendor-delivered affine-consistent RPC takes), four corner
  * GCPs are produced by RPCInverseTransformPoint's iterative scheme
  * (alg/gdal_rpc.cpp:1130 — linear init from the center Jacobian, then
  * back-projection correction to <0.1 px), and GDALGCPsToGeoTransform
  * refits the affine. On an affine-exact model the center Jacobian is the
  * exact map, so the inverse converges on the first check and the refit
  * reproduces the input gt to solver precision — which is what makes the
  * q31 tile-structure oracle applicable end-to-end (q161). NULL on a
  * singular geotransform. */
case class RpcRefitGt(children: Seq[Expression])
    extends Expression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(children.length == 3, "rpc_refit_gt(gt, w, h)")
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(ArrayType(DoubleType), IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "rpc_refit_gt"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val gt = vals(0).asInstanceOf[ArrayData].toDoubleArray()
    if (gt.length != 6) return null
    val w = vals(1).asInstanceOf[Int].toDouble
    val h = vals(2).asInstanceOf[Int].toDouble
    val det = gt(1) * gt(5) - gt(2) * gt(4)
    if (math.abs(det) < 1e-300 || w <= 0 || h <= 0) return null
    // geo→pixel inverse affine (GDALInvGeoTransform)
    val i1 = gt(5) / det; val i2 = -gt(2) / det
    val i4 = -gt(4) / det; val i5 = gt(1) / det
    val i0 = -(gt(0) * i1 + gt(3) * i2)
    val i3 = -(gt(0) * i4 + gt(3) * i5)
    // normalize to the footprint: offsets at the image center, scales at
    // the half-extents (the RPC_* metadata convention, gdal_rpc.cpp)
    val cx = gt(0) + gt(1) * w / 2 + gt(2) * h / 2
    val cy = gt(3) + gt(4) * w / 2 + gt(5) * h / 2
    val lonS = math.max(math.abs(gt(1)) * w / 2 + math.abs(gt(2)) * h / 2, 1e-12)
    val latS = math.max(math.abs(gt(4)) * w / 2 + math.abs(gt(5)) * h / 2, 1e-12)
    val sampS = math.max(w / 2, 1.0); val lineS = math.max(h / 2, 1.0)
    def lin(c0: Double, cl: Double, cp: Double, off: Double, scale: Double): Array[Double] = {
      val a = new Array[Double](20)
      a(0) = (c0 + cl * cx + cp * cy - off) / scale
      a(1) = cl * lonS / scale
      a(2) = cp * latS / scale
      a
    }
    val one = RpcRefitGt.unitDen
    val model = Rpc(
      lineOff = h / 2, sampOff = w / 2, latOff = cy, longOff = cx, heightOff = 0.0,
      lineScale = lineS, sampScale = sampS, latScale = latS, longScale = lonS,
      heightScale = 1.0,
      lineNum = lin(i3, i4, i5, h / 2, lineS), lineDen = one,
      sampNum = lin(i0, i1, i2, w / 2, sampS), sampDen = one)
    val pxs = Array(0.0, w, 0.0, w)
    val pys = Array(0.0, 0.0, h, h)
    val gxs = new Array[Double](4); val gys = new Array[Double](4)
    try {
      var k = 0
      while (k < 4) {
        val (lon, lat) = Rpc.inverse(model, pxs(k), pys(k), 0.0)
        gxs(k) = lon; gys(k) = lat
        k += 1
      }
      GcpPoly.gcpsToGeoTransform(pxs, pys, gxs, gys)
        .map(new GenericArrayData(_)).orNull
    } catch { case _: IllegalArgumentException => null }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): RpcRefitGt =
    copy(children = c)
}

object RpcRefitGt {
  /** Constant denominator [1, 0×19]; read-only by Rpc.evalPoly, so one
    * shared instance serves every refit on the thread. */
  private[expr] val unitDen: Array[Double] = {
    val a = new Array[Double](20); a(0) = 1.0; a
  }
}

/** gcp_poly_transform(x, y) with a driver-fitted polynomial → [tx, ty]. */
case class GcpPolyEval(left: Expression, right: Expression, fit: GcpPoly.Fit)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gcp_poly_transform"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    GeorefEval.gcp(fit, x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gcpFit", fit, "java.lang.Object")
    defineCodeGen(ctx, ev, (x, y) => s"graft.expr.GeorefEval.gcp($ref, $x, $y)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GcpPolyEval =
    copy(left = l, right = r)
}

/** tps_transform(x, y) with a driver-fitted thin plate spline → [tx, ty]. */
case class TpsEval(left: Expression, right: Expression, fit: Tps.Fit)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tps_transform"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    GeorefEval.tps(fit, x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tpsFit", fit, "java.lang.Object")
    defineCodeGen(ctx, ev, (x, y) => s"graft.expr.GeorefEval.tps($ref, $x, $y)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TpsEval =
    copy(left = l, right = r)
}

/** rpc_forward(lon, lat, h) → [pixel, line]; inverse=true gives
  * rpc_inverse(pixel, line, h) → [lon, lat]. */
case class RpcEval(first: Expression, second: Expression, third: Expression,
                   model: Rpc, inverse: Boolean)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (inverse) "rpc_inverse" else "rpc_forward"
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    if (inverse) GeorefEval.rpcInv(model, a.asInstanceOf[Double], b.asInstanceOf[Double], c.asInstanceOf[Double])
    else GeorefEval.rpcFwd(model, a.asInstanceOf[Double], b.asInstanceOf[Double], c.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rpcModel", model, "java.lang.Object")
    val fn = if (inverse) "rpcInv" else "rpcFwd"
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.expr.GeorefEval.$fn($ref, $a, $b, $c)")
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): RpcEval =
    copy(first = a, second = b, third = c)
}

/** homography_transform(x, y) with a driver-fitted 9-coefficient
  * projective transform (alg/gdal_homography.cpp) → [tx, ty]; a vanishing
  * projective weight yields [NaN, NaN] (the reference's per-point failure
  * flag). */
case class HomographyEval(left: Expression, right: Expression, h: Array[Double])
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "homography_transform"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    GeorefEval.homography(h, x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("homography", h, "java.lang.Object")
    defineCodeGen(ctx, ev, (x, y) => s"graft.expr.GeorefEval.homography($ref, $x, $y)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HomographyEval =
    copy(left = l, right = r)
}

/** geoloc_transform(p, l) through a driver-held geolocation-array
  * transformer (alg/gdalgeoloc.cpp) → [geoX, geoY]; inverse = true gives
  * geoloc_inverse(geoX, geoY) → [pixel, line], [NaN, NaN] when no
  * geolocation cell contains the point. */
case class GeoLocEval(left: Expression, right: Expression, geoloc: GeoLoc, inverse: Boolean)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (inverse) "geoloc_inverse" else "geoloc_transform"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    if (inverse) GeorefEval.geolocInv(geoloc, x.asInstanceOf[Double], y.asInstanceOf[Double])
    else GeorefEval.geolocFwd(geoloc, x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geoloc", geoloc, "java.lang.Object")
    val fn = if (inverse) "geolocInv" else "geolocFwd"
    defineCodeGen(ctx, ev, (x, y) => s"graft.expr.GeorefEval.$fn($ref, $x, $y)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeoLocEval =
    copy(left = l, right = r)
}

/** suggest_warp_output(w, h, h9) — GDALSuggestedWarpOutput2 over a
  * PER-ROW homography (9 doubles; affine rasters pass (h6,h7,h8) =
  * (1,0,0)) → struct<px:int, ln:int, gt:array<double>,
  * extent:array<double>>; NULL when the transformer is degenerate. */
case class SuggestWarpOutput(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes: Seq[DataType] =
    Seq(IntegerType, IntegerType, ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("px", IntegerType, nullable = false),
    StructField("ln", IntegerType, nullable = false),
    StructField("gt", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("extent", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "suggest_warp_output"
  override protected def nullSafeEval(wv: Any, hv: Any, av: Any): Any = {
    val h9 = av.asInstanceOf[ArrayData].toDoubleArray()
    if (h9.length != 9) return null
    val res = for {
      t <- graft.core.WarpOutput.homographyTransformer(h9)
      r <- graft.core.WarpOutput.suggest(wv.asInstanceOf[Int], hv.asInstanceOf[Int], t)
    } yield r
    res match {
      case Some(r) => org.apache.spark.sql.catalyst.InternalRow(
        r.pixels, r.lines, new GenericArrayData(r.gt), new GenericArrayData(r.extent))
      case None => null
    }
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): SuggestWarpOutput =
    copy(first = a, second = b, third = c)
}
