package graft.core

import org.scalatest.funsuite.AnyFunSuite

class GeorefSpec extends AnyFunSuite {

  // deterministic scattered-but-not-collinear control points
  private def gcpGrid(n: Int): (Array[Double], Array[Double]) = {
    val px = Array.tabulate(n)(i => (i % 7).toDouble * 4 + (i / 7) % 3)
    val py = Array.tabulate(n)(i => (i / 7).toDouble * 4 + (i * 5) % 3)
    (px, py)
  }

  test("order-1 fit recovers an exact affine map at machine precision") {
    val (px, py) = gcpGrid(12)
    val gx = px.zip(py).map { case (x, y) => 100.0 + 2.5 * x - 0.5 * y }
    val gy = px.zip(py).map { case (x, y) => -40.0 + 0.25 * x + 3.0 * y }
    val b = GcpPoly.fitBoth(px, py, gx, gy, order = 1)
    for (i <- px.indices) {
      val (fx, fy) = b.toGeo(px(i), py(i))
      assert(math.abs(fx - gx(i)) < 1e-9 && math.abs(fy - gy(i)) < 1e-9)
      val (ix, iy) = b.toPixel(gx(i), gy(i))
      assert(math.abs(ix - px(i)) < 1e-9 && math.abs(iy - py(i)) < 1e-9)
    }
    // and at a non-GCP point
    val (fx, fy) = b.toGeo(3.25, 7.75)
    assert(math.abs(fx - (100.0 + 2.5 * 3.25 - 0.5 * 7.75)) < 1e-9)
    assert(math.abs(fy - (-40.0 + 0.25 * 3.25 + 3.0 * 7.75)) < 1e-9)
  }

  test("order-2 fit recovers an exact quadratic map; order-3 a cubic") {
    val (px, py) = gcpGrid(21)
    def q(x: Double, y: Double) = 2.0 + 3 * x + 5 * y + x * x / 16 + x * y / 8 + y * y / 16
    def c(x: Double, y: Double) = q(x, y) + x * x * x / 64 - x * y * y / 32
    val gx2 = px.zip(py).map { case (x, y) => q(x, y) }
    val gy2 = px.zip(py).map { case (x, y) => q(y, x) }
    val f2 = GcpPoly.fit(px, py, gx2, gy2, order = 2)
    val (v2x, v2y) = f2(5.0, 11.0)
    assert(math.abs(v2x - q(5.0, 11.0)) < 1e-7)
    assert(math.abs(v2y - q(11.0, 5.0)) < 1e-7)
    val gx3 = px.zip(py).map { case (x, y) => c(x, y) }
    val gy3 = px.zip(py).map { case (x, y) => c(y, x) }
    val f3 = GcpPoly.fit(px, py, gx3, gy3, order = 3)
    val (v3x, v3y) = f3(5.0, 11.0)
    assert(math.abs(v3x - c(5.0, 11.0)) < 1e-6)
    assert(math.abs(v3y - c(11.0, 5.0)) < 1e-6)
  }

  test("least-squares beats any single-point fit on noisy GCPs (residual orthogonality)") {
    // affine + deterministic pseudo-noise; LSQ residuals must sum to ~0
    val (px, py) = gcpGrid(15)
    val gx = px.zip(py).zipWithIndex.map { case ((x, y), i) => 10.0 + x + 2 * y + ((i * 7) % 5 - 2) * 0.01 }
    val gy = px.zip(py).zipWithIndex.map { case ((x, y), i) => -5.0 + 3 * x - y + ((i * 3) % 5 - 2) * 0.01 }
    val f = GcpPoly.fit(px, py, gx, gy, 1)
    var rx = 0.0; var ry = 0.0
    for (i <- px.indices) {
      val (vx, vy) = f(px(i), py(i))
      rx += gx(i) - vx; ry += gy(i) - vy
    }
    assert(math.abs(rx) < 1e-9 && math.abs(ry) < 1e-9)
  }

  test("2-GCP order-1 synthesizes the rectangle corner (gdal_crs.cpp:223)") {
    val b = GcpPoly.fitBoth(Array(0.0, 10.0), Array(0.0, 20.0),
      Array(100.0, 200.0), Array(50.0, 10.0), order = 1)
    val (gx, gy) = b.toGeo(10.0, 0.0) // the synthesized corner
    assert(math.abs(gx - 200.0) < 1e-9 && math.abs(gy - 50.0) < 1e-9)
    val (cx, cy) = b.toGeo(5.0, 10.0)
    assert(math.abs(cx - 150.0) < 1e-9 && math.abs(cy - 30.0) < 1e-9)
  }

  test("gcpsToGeoTransform: 2-GCP axis-aligned case and general order-1 fit") {
    val gt2 = GcpPoly.gcpsToGeoTransform(Array(0.0, 100.0), Array(0.0, 50.0),
      Array(500.0, 600.0), Array(80.0, 30.0)).get
    assert(gt2.sameElements(Array(500.0, 1.0, 0.0, 80.0, 0.0, -1.0)))
    val (px, py) = gcpGrid(9)
    val gx = px.zip(py).map { case (x, y) => 7.0 + 0.5 * x + 0.125 * y }
    val gy = px.zip(py).map { case (x, y) => 9.0 - 0.25 * x + 2.0 * y }
    val gt = GcpPoly.gcpsToGeoTransform(px, py, gx, gy).get
    assert(math.abs(gt(0) - 7.0) < 1e-9 && math.abs(gt(1) - 0.5) < 1e-9 &&
      math.abs(gt(2) - 0.125) < 1e-9 && math.abs(gt(3) - 9.0) < 1e-9 &&
      math.abs(gt(4) + 0.25) < 1e-9 && math.abs(gt(5) - 2.0) < 1e-9)
    assert(GcpPoly.gcpsToGeoTransform(Array(0.0), Array(0.0), Array(1.0), Array(1.0)).isEmpty)
  }

  test("TPS interpolates control points exactly and reduces to the affine map on affine data") {
    val (px, py) = gcpGrid(10)
    val gx = px.zip(py).map { case (x, y) => 1.5 + 0.75 * x + 0.25 * y }
    val gy = px.zip(py).map { case (x, y) => -2.0 + 0.5 * x + 1.25 * y }
    val b = Tps.fitBoth(px, py, gx, gy)
    for (i <- px.indices) {
      val (vx, vy) = b.toGeo(px(i), py(i))
      assert(math.abs(vx - gx(i)) < 1e-8 && math.abs(vy - gy(i)) < 1e-8)
    }
    // affine data => RBF weights vanish => affine everywhere, incl. far outside the hull
    val (ex, ey) = b.toGeo(60.0, -35.0)
    assert(math.abs(ex - (1.5 + 0.75 * 60.0 + 0.25 * -35.0)) < 1e-6)
    assert(math.abs(ey - (-2.0 + 0.5 * 60.0 + 1.25 * -35.0)) < 1e-6)
  }

  test("TPS bends through non-affine targets (still exact at every GCP)") {
    val (px, py) = gcpGrid(14)
    val gx = px.zip(py).zipWithIndex.map { case ((x, y), i) => x + ((i * 11) % 7 - 3) * 0.4 }
    val gy = px.zip(py).zipWithIndex.map { case ((x, y), i) => y + ((i * 5) % 7 - 3) * 0.4 }
    val f = Tps.fit(px, py, gx, gy)
    for (i <- px.indices) {
      val (vx, vy) = f(px(i), py(i))
      assert(math.abs(vx - gx(i)) < 1e-7, s"gcp $i x: $vx vs ${gx(i)}")
      assert(math.abs(vy - gy(i)) < 1e-7, s"gcp $i y: $vy vs ${gy(i)}")
    }
  }

  private def testRpc: Rpc = {
    // deterministic exact-binary coefficients; denominators near 1
    val sampNum = Array.tabulate(20)(i => if (i == 0) 0.0 else ((i * 7) % 11 - 5) / 64.0)
    val sampDen = Array.tabulate(20)(i => if (i == 0) 1.0 else ((i * 3) % 5 - 2) / 512.0)
    val lineNum = Array.tabulate(20)(i => if (i == 0) 0.0 else ((i * 13) % 11 - 5) / 64.0)
    val lineDen = Array.tabulate(20)(i => if (i == 0) 1.0 else ((i * 5) % 5 - 2) / 512.0)
    // make the linear terms dominant so the map is invertible over the domain
    val sn = sampNum.updated(1, 1.0).updated(2, 0.125)
    val ln = lineNum.updated(1, -0.0625).updated(2, 1.0)
    Rpc(lineOff = 500, sampOff = 500, latOff = 20, longOff = 10, heightOff = 0,
      lineScale = 500, sampScale = 500, latScale = 5, longScale = 5, heightScale = 100,
      lineNum = ln, lineDen = lineDen, sampNum = sn, sampDen = sampDen)
  }

  test("RPC forward matches a direct rational-polynomial evaluation") {
    val m = testRpc
    val (px, py) = Rpc.forward(m, lon = 12.0, lat = 18.5, h = 40.0)
    val t = new Array[Double](20)
    Rpc.terms((12.0 - 10) / 5, (18.5 - 20) / 5, 40.0 / 100, t)
    val ex = Rpc.evalPoly(t, m.sampNum) / Rpc.evalPoly(t, m.sampDen) * 500 + 500
    val ey = Rpc.evalPoly(t, m.lineNum) / Rpc.evalPoly(t, m.lineDen) * 500 + 500
    assert(px == ex && py == ey)
  }

  test("RPC inverse roundtrips forward within 1e-6 px over the validity domain") {
    val m = testRpc
    for (i <- 0 until 40) {
      val lon = 10.0 + ((i * 13) % 21 - 10) * 0.45
      val lat = 20.0 + ((i * 7) % 21 - 10) * 0.45
      val h = ((i * 3) % 9) * 10.0
      val (px, py) = Rpc.forward(m, lon, lat, h)
      val (rlon, rlat) = Rpc.inverse(m, px, py, h, maxIter = 20, pixErrThreshold = 1e-9)
      val (bx, by) = Rpc.forward(m, rlon, rlat, h)
      assert(math.abs(bx - px) < 1e-6 && math.abs(by - py) < 1e-6,
        s"roundtrip off at ($lon,$lat,$h): ($bx,$by) vs ($px,$py)")
    }
  }

  test("dateline wrap: longitudes straddling ±180 normalize consistently") {
    val m = testRpc.copy(longOff = 179.5, longScale = 1.0)
    val (pA, _) = Rpc.forward(m, 179.8, 20.0, 0.0)
    val (pB, _) = Rpc.forward(m, -179.9, 20.0, 0.0) // = 180.1 unwrapped => diff 0.6
    val t = new Array[Double](20)
    Rpc.terms(0.6000000000000227 /*180.1-179.5 in wrapped arithmetic*/, 0.0, 0.0, t)
    assert(pA != pB) // distinct points stay distinct
    val (pC, _) = Rpc.forward(m, 180.1 - 360.0, 20.0, 0.0)
    assert(pB == pC)
  }

  // q161 path: the affine encoded as a rational-polynomial model, corners
  // recovered via Rpc.inverse's iterative scheme, affine refit from them
  private def rpcRefit(gt: Array[Double], w: Int, h: Int): Option[Array[Double]] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val e = graft.expr.RpcRefitGt(Seq(
      Literal.create(gt, ArrayType(DoubleType)), Literal(w), Literal(h)))
    Option(e.eval(null)).map(_.asInstanceOf[ArrayData].toDoubleArray())
  }

  test("rpc_refit_gt reproduces an affine geotransform through the iterative RPC inverse") {
    val cases = Seq(
      (Array(12.5, 0.03, 0.0, -7.25, 0.0, -0.05), 256, 192),     // north-up
      (Array(12.5, 0.03, 0.004, -7.25, -0.002, -0.05), 256, 192), // sheared
      (Array(-179.0, 0.25, 0.0, 80.0, 0.0, -0.125), 64, 64))      // coarse global
    for ((gt, w, h) <- cases) {
      val out = rpcRefit(gt, w, h).getOrElse(fail(s"refit returned null for ${gt.toSeq}"))
      for (i <- 0 until 6)
        assert(math.abs(out(i) - gt(i)) <= 1e-9 * math.max(1.0, math.abs(gt(i))),
          s"gt($i): ${out(i)} vs ${gt(i)}")
    }
  }

  test("rpc_refit_gt is NULL on a singular geotransform") {
    assert(rpcRefit(Array(0.0, 1.0, 2.0, 0.0, 2.0, 4.0), 32, 32).isEmpty)
  }

  test("solver refuses singular systems (collinear GCPs)") {
    val px = Array(0.0, 1.0, 2.0, 3.0)
    val py = Array(0.0, 1.0, 2.0, 3.0) // collinear
    assertThrows[IllegalArgumentException] {
      GcpPoly.fit(px, py, px, py, 2)
    }
  }

  // the q143 fixture, driver-side: exact dyadic affine + 4 planted outliers
  private def outlierGcps(): (Array[Double], Array[Double], Array[Double], Array[Double]) = {
    val keys = Array.range(0, 25)
    val px = keys.map(k => (k % 5) * 6.0)
    val py = keys.map(k => (k / 5) * 6.0)
    val gx = keys.indices.map { i =>
      (384 + px(i) * 192 + py(i) * 64) / 256.0 + (if (keys(i) % 7 == 3) 7.0 else 0.0)
    }.toArray
    val gy = keys.indices.map { i =>
      (-512 + px(i) * 128 + py(i) * 320) / 256.0 - (if (keys(i) % 7 == 3) 5.0 else 0.0)
    }.toArray
    (px, py, gx, gy)
  }

  test("refine drops exactly the planted outliers and recovers the affine") {
    val (px, py, gx, gy) = outlierGcps()
    val r = GcpPoly.refine(px, py, gx, gy, order = 1, tolerance = 1.0)
    assert(r.dropped.sorted.toSeq == Seq(3, 10, 17, 24))
    assert(r.kept.length == 21 && !r.kept.exists(k => k % 7 == 3))
    // worst residual is dropped first: key 10 leads for this geometry
    assert(r.dropped.head == 10)
    for (tx <- Seq(3.0, 24.0, 11.5); ty <- Seq(0.0, 7.0, 13.0)) {
      val (fx, fy) = r.both.fwd(tx, ty)
      assert(math.abs(fx - (384 + tx * 192 + ty * 64) / 256.0) < 1e-9)
      assert(math.abs(fy - (-512 + tx * 128 + ty * 320) / 256.0) < 1e-9)
      val (rx, ry) = r.both.inv(fx, fy)
      assert(math.abs(rx - tx) < 1e-9 && math.abs(ry - ty) < 1e-9)
    }
  }

  test("refine is a no-op on a consistent GCP set; minimumGcps floors the loop") {
    val (px, py, _, _) = outlierGcps()
    val gx = px.indices.map(i => (384 + px(i) * 192 + py(i) * 64) / 256.0).toArray
    val gy = px.indices.map(i => (-512 + px(i) * 128 + py(i) * 320) / 256.0).toArray
    val clean = GcpPoly.refine(px, py, gx, gy, order = 1, tolerance = 1.0)
    assert(clean.dropped.isEmpty && clean.kept.length == 25)
    // tolerance 0 keeps dropping (zeroed residuals still clear >= 0, per
    // worst_outlier's comparison) until only minimumGcps remain
    val floored = GcpPoly.refine(px, py, gx, gy, order = 1, tolerance = 0.0, minimumGcps = 20)
    assert(floored.kept.length == 20)
    // ...and a full drain degenerates to collinear survivors: the refit
    // goes singular and the fit FAILS, like the reference (remove_outliers
    // propagates MUNSOLVABLE and GDALCreateGCPTransformerEx returns null)
    assertThrows[IllegalArgumentException] {
      GcpPoly.refine(px, py, gx, gy, order = 1, tolerance = 0.0)
    }
  }
}
