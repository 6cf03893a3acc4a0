package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Deterministic synthetic corpus per FIXTURES.md / BASELINE.json
  * `input_hint`: images(image_id, bytes, w, h, fmt, caption, phash)
  * + georef sidecar (gt, srid). Keys derive from the driver's TPC-H-ish
  * tables so the DuckDB oracle can re-derive the same geometry in SQL
  * (geometric parity: every derived coordinate uses only exactly-specified
  * IEEE ops on integer inputs). Pixel pattern:
  * pixel(x,y) = (x*7 + y*13 + i*31) mod 256 per band
  * (the Fill()-style synthesized-raster analog of
  * autotest/benchmark/test_gdalwarp.py:24-42).
  */
object Fixtures {
  val Sizes: Array[Int] = Array(16, 20, 64, 256)
  private val Adjectives = Array("amber", "quiet", "rapid", "lucid", "feral", "mossy", "pale")
  private val Nouns = Array("harbor", "mesa", "delta", "canyon", "atoll", "steppe")

  final case class ImageRow(key: Long, image_id: String, bytes: Array[Byte], w: Int, h: Int,
                            fmt: String, caption: String, phash: Long,
                            gt: Array[Double], srid: Int)

  def patternRaster(i: Long, w: Int, h: Int, nBands: Int): Raster = {
    val bands = Array.fill(nBands) {
      val a = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { a(y * w + x) = ((x * 7 + y * 13 + i * 31) % 256).toInt; x += 1 }
        y += 1
      }
      a
    }
    Raster(w, h, bands)
  }

  /** Deterministic image spec for key i (see Geospatial oracle SQL — the
    * 4326 branch must stay expressible with exact IEEE ops). */
  def genImage(i: Long): ImageRow = {
    val size = Sizes((i % 4).toInt)
    val fmt = (i % 3) match { case 0 => "raw"; case 1 => "png"; case _ => "jpeg" }
    val nBands = if (fmt == "jpeg") 3 else if (i % 2 == 0) 1 else 3
    val raster = patternRaster(i, size, size, nBands)
    val bytes = ImageCodec.encode(raster, fmt)
    val utm = i % 8 == 1
    val (gt, srid) =
      if (utm) {
        val e0 = 300000.0 + (i % 401) * 500.0
        val n0 = 3600000.0 + (i % 397) * 500.0
        val res = 30.0 + (i % 7) * 15.0
        (Array(e0, res, 0.0, n0, 0.0, -res), if ((i / 8) % 2 == 0) 32611 else 32631)
      } else {
        val span = 0.01 * (1 + (i % 499))
        val res = span / size
        val lon0 = ((i * 9973) % 350000) / 1000.0 - 180.0
        val lat0 = ((i * 7919) % 160000) / 1000.0 - 80.0
        (Array(lon0, res, 0.0, lat0, 0.0, -res), 4326)
      }
    val caption = f"caption for img$i%08d: ${Adjectives((i % Adjectives.length).toInt)} ${Nouns((i % Nouns.length).toInt)}"
    ImageRow(i, f"img$i%08d", bytes, size, size, fmt, caption,
      graft.expr.GeoKernels.phashOfRaster(raster), gt, srid)
  }

  // corpus-table materialization cache: many queries read the same
  // synthesized images table; persist once per (session, sf dir) — the
  // moral equivalent of the corpus being a real stored table
  private val imagesCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Image corpus keyed by part table keys (oracle-joinable). Repartitioned
    * to the session's parallelism BEFORE synthesis: the part table arrives
    * in a handful of parquet splits, and per-image kernels downstream
    * (decode/focal/contour/polygonize) must fan across every core. */
  def imagesFromParts(s: SparkSession, dir: String): DataFrame =
    imagesCache.computeIfAbsent((s, dir), { _ =>
      import s.implicits._
      val df = s.read.parquet(s"$dir/part.parquet").select(col("p_partkey"))
        .repartition(s.sparkContext.defaultParallelism)
        .as[Long].map(genImage).toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count() // materialize so downstream stages never re-encode
      df
    })

  /** Standalone corpus of n images (bench path — no source table read). */
  def imagesFromRange(s: SparkSession, n: Long, partitions: Int = 32): DataFrame = {
    import s.implicits._
    s.range(0, n, 1, partitions).as[Long].map(genImage).toDF()
  }

  /** Query points from orders keys: lon/lat hashed-uniform via exact
    * integer arithmetic (matches the oracle SQL formulas verbatim). */
  def pointsFromOrders(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("point_id"),
        (((col("o_orderkey") * 9973) % 360000) / 1000.0 - 180.0).as("lon"),
        (((col("o_orderkey") * 7919) % 170000) / 1000.0 - 85.0).as("lat"))

  /** 25 region boxes from nation keys, offset +0.0005° so no derived point
    * ever sits exactly on an edge (PIP boundary conventions stay moot). */
  def regionBoxesSpec(nationKey: Int): (Double, Double, Double, Double) = {
    val ix = nationKey % 5
    val iy = (nationKey - (nationKey % 5)) / 5
    val minx = ix * 72.0 - 180.0 + 0.0005
    val miny = iy * 34.0 - 85.0 + 0.0005
    (minx, miny, minx + 57.6, miny + 27.2)
  }

  def regionBoxes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/nation.parquet").select(col("n_nationkey").cast("int")).as[Int]
      .map { k =>
        val (minx, miny, maxx, maxy) = regionBoxesSpec(k)
        (k.toLong, Wkb.writeBox(minx, miny, maxx, maxy))
      }
      .toDF("region_id", "wkb")
  }

  /** 25 deterministic repair subjects from nation keys: even keys are
    * self-crossing bowties over [x0,x0+w]×[y0,y0+h] (even-odd repaired
    * area = w·h/2), odd keys are valid boxes (make_valid passthrough,
    * area = w·h). w and h are even integers so every slab coordinate the
    * repair produces is dyadic-exact — the area oracle is pure int SQL. */
  def invalidPolysFromNation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/nation.parquet").select(col("n_nationkey").cast("int")).as[Int]
      .map { k =>
        val x0 = (k * 7 % 50).toDouble; val y0 = (k * 11 % 40).toDouble
        val w = (2 + (k % 5) * 2).toDouble; val h = (2 + (k % 3) * 2).toDouble
        val wkb =
          if (k % 2 == 0)
            Wkb.writePolygon(Array(Array(x0, y0, x0 + w, y0 + h, x0 + w, y0, x0, y0 + h, x0, y0)))
          else Wkb.writeBox(x0, y0, x0 + w, y0 + h)
        (k.toLong, wkb)
      }
      .toDF("geom_id", "wkb")
  }

  /** Grid-interpolation nodes from supplier keys, at +0.25° offsets so no
    * point ever coincides with a node (bounds the inverse-distance
    * weights; see ops.Grid). */
  def nodesFromSuppliers(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey").cast("bigint").as("t_id"),
        ((((col("s_suppkey") * 31) % 360) - 180) + 0.25).cast("double").as("t_lon"),
        ((((col("s_suppkey") * 17) % 160) - 80) + 0.25).cast("double").as("t_lat"))

  /** Orders points carrying an exact integer value (whole dollars). */
  def valuedPointsFromOrders(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("p_id"),
        (((col("o_orderkey") * 9973) % 360000) / 1000.0 - 180.0).as("p_lon"),
        (((col("o_orderkey") * 7919) % 170000) / 1000.0 - 85.0).as("p_lat"),
        round(col("o_totalprice")).cast("bigint").as("value_i"))

  /** 5 kNN targets from region keys (exact integer-derived coordinates). */
  /** Diagonal (slope-1) line features from customer keys. Slope 1 keeps
    * the box-clip oracle closed-form: the clipped sub-segment's x-interval
    * is [max(ax, minx, ax+miny−ay), min(bx, maxx, ax+maxy−ay)] — pure
    * greatest/least SQL. Offsets 0.2101/0.37 keep endpoints off the
    * region-box 5·10⁻⁴ grid so no clip parameter ties a box edge. */
  def linesFromCustomers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/customer.parquet").select(col("c_custkey").cast("long")).as[Long]
      .map { k =>
        val ax = ((k * 37) % 340) - 170 + 0.2101
        val ay = ((k * 53) % 150) - 75 + 0.37
        val len = 5.0 + (k % 37) * 2.0
        (k, Wkb.writeLineString(Array(ax, ay, ax + len, ay + len)))
      }
      .toDF("line_id", "wkb_a")
  }

  /** GGA_Linear fixture: a 25×25 jittered grid (nation × nation) whose
    * value field is the exact plane v = 3x + 7y + 10. Jitter is dyadic
    * (k/16, so 3x/7y stay exact doubles) and only tangential on the hull
    * boundary (corners pinned), so the convex hull is exactly [0,24]² and
    * barycentric interpolation over ANY valid triangulation reproduces
    * the plane — the DuckDB oracle never needs the triangle set. */
  def planeGridPoints(s: SparkSession, dir: String): DataFrame = {
    val n1 = s.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").cast("long").as("i"))
    val n2 = s.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").cast("long").as("j"))
    n1.crossJoin(n2)
      .select(
        (col("i") * 25 + col("j")).as("p_id"),
        (col("i").cast("double") + when(col("i") > 0 && col("i") < 24,
          (((col("i") * 7 + col("j") * 13) % 8) - 4).cast("double") / 16.0)
          .otherwise(0.0)).as("p_lon"),
        (col("j").cast("double") + when(col("j") > 0 && col("j") < 24,
          (((col("i") * 11 + col("j") * 5) % 8) - 4).cast("double") / 16.0)
          .otherwise(0.0)).as("p_lat"))
      .withColumn("v", col("p_lon") * 3.0 + col("p_lat") * 7.0 + 10.0)
  }

  /** Interpolation targets strictly inside the planeGridPoints hull:
    * coordinates in [0.3, 23.3] ⊂ (0, 24). Centiles keep the plane value
    * ×256 at least 1/50 away from every rounding boundary (see q88). */
  def planeTargets(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey").cast("bigint").as("t_id"),
        (((col("s_suppkey") * 37) % 2301).cast("double") / 100.0 + 0.3).as("t_lon"),
        (((col("s_suppkey") * 53) % 2301).cast("double") / 100.0 + 0.3).as("t_lat"))

  def targetsFromRegions(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/region.parquet")
      .select(col("r_regionkey").cast("bigint").as("t_id"),
        (((col("r_regionkey") * 67) % 360) - 180 + 0.5).cast("double").as("t_lon"),
        (((col("r_regionkey") * 43) % 160) - 80 + 0.5).cast("double").as("t_lat"))

  /** 25 control points on the 5×5 grid {0,6,..,24}² whose geo targets are
    * an EXACT total-degree-2 map with coefficients on the 2⁻⁵ grid:
    *   gx·32 = 64 + 96·px + 160·py + 2·px² + 4·px·py + 2·py²
    *   gy·32 = −96 + 64·px − 32·py + px² − 2·px·py + py²
    * A unique order-2 least-squares fit therefore recovers the map to
    * solver precision (~1e-12), and transformed INTEGER points land on the
    * 2⁻⁵ grid: round(value·256) is an exact-integer SQL oracle with a 0.5
    * quantum against ~1e-7 drift (q93). */
  def gcpQuadFromNation(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/nation.parquet")
      .select(
        ((col("n_nationkey") % 5) * 6).cast("double").as("px"),
        (floor(col("n_nationkey") / 5) * 6).cast("double").as("py"))
      .withColumn("gx",
        (lit(64) + col("px") * 96 + col("py") * 160 + col("px") * col("px") * 2 +
          col("px") * col("py") * 4 + col("py") * col("py") * 2) / 32.0)
      .withColumn("gy",
        (lit(-96) + col("px") * 64 - col("py") * 32 + col("px") * col("px") -
          col("px") * col("py") * 2 + col("py") * col("py")) / 32.0)

  /** Same 5×5 source grid with EXACTLY AFFINE geo targets (coefficients on
    * the 2⁻² grid). The TPS interpolation system then has the affine map
    * with zero RBF weights as its unique solution, so tps(anything) is the
    * affine map to solver precision — SQL-closed-form everywhere (q94). */
  def gcpAffineFromNation(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/nation.parquet")
      .select(
        ((col("n_nationkey") % 5) * 6).cast("double").as("px"),
        (floor(col("n_nationkey") / 5) * 6).cast("double").as("py"))
      .withColumn("gx", (lit(384) + col("px") * 192 + col("py") * 64) / 256.0)
      .withColumn("gy", (lit(-512) + col("px") * 128 + col("py") * 320) / 256.0)

  /** The gcpAffineFromNation grid with four PLANTED OUTLIERS
    * (n_nationkey % 7 == 3 → keys 3, 10, 17, 24): their geo targets are
    * offset by (+7, −5) — residual magnitude ≈ 8.6 against a refine
    * tolerance of 1 — so remove_outliers-style refinement must drop
    * exactly those four, and the surviving 21 exactly-affine GCPs make
    * the refined fit THE dyadic affine to solver precision (q143's
    * round(·×256) oracle; verified deterministic: residual ordering keeps
    * every planted outlier above every inlier at each iteration). */
  def gcpOutlierFromNation(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").cast("bigint").as("id"),
        ((col("n_nationkey") % 5) * 6).cast("double").as("px"),
        (floor(col("n_nationkey") / 5) * 6).cast("double").as("py"))
      .withColumn("bad", (col("id") % 7) === 3)
      .withColumn("gx", (lit(384) + col("px") * 192 + col("py") * 64) / 256.0 +
        when(col("bad"), 7.0).otherwise(0.0))
      .withColumn("gy", (lit(-512) + col("px") * 128 + col("py") * 320) / 256.0 -
        when(col("bad"), 5.0).otherwise(0.0))
      .drop("bad")

  /** Same 5×5 source grid with geo targets from an EXACT projective map
    * with dyadic coefficients:
    *   gx = (2 + px/2 + py/4) / w,  gy = (−3 + px/8 + 3·py/4) / w,
    *   w  = 1 + px/64 + py/128   (w ∈ [1, 1.5625] on the grid — never 0,
    * and the image of the grid square stays convex, so the reference's
    * cross-product check passes). The 25 exactly-consistent GCPs make the
    * rank-8 least-squares system recover the map to solver precision
    * (~1e-12 after de-normalization); q122 quantizes products t·w·256
    * back to exact integers (see the oracle derivation there). */
  def gcpHomographyFromNation(s: SparkSession, dir: String): DataFrame = {
    val base = s.read.parquet(s"$dir/nation.parquet")
      .select(
        ((col("n_nationkey") % 5) * 6).cast("double").as("px"),
        (floor(col("n_nationkey") / 5) * 6).cast("double").as("py"))
      .withColumn("w", lit(1.0) + col("px") / 64.0 + col("py") / 128.0)
    base
      .withColumn("gx", (lit(2.0) + col("px") / 2.0 + col("py") / 4.0) / col("w"))
      .withColumn("gy", (lit(-3.0) + col("px") / 8.0 + col("py") * 3.0 / 4.0) / col("w"))
      .drop("w")
  }

  /** Deterministic RPC model with exact-binary coefficients (k/64 and
    * k/512 with integer k): every coefficient, offset, and scale is an
    * exact double, so the forward rational evaluation is a fixed sequence
    * of exactly-rounded IEEE ops — bit-reproducible in any engine that
    * mirrors the op order (q95's oracle does). Linear terms are pinned
    * dominant so the map is invertible over the validity domain. */
  lazy val benchRpc: Rpc = {
    val sampNum = Array.tabulate(20)(i => if (i == 0) 0.0 else ((i * 7) % 11 - 5) / 64.0)
      .updated(1, 1.0).updated(2, 0.125)
    val sampDen = Array.tabulate(20)(i => if (i == 0) 1.0 else ((i * 3) % 5 - 2) / 512.0)
    val lineNum = Array.tabulate(20)(i => if (i == 0) 0.0 else ((i * 13) % 11 - 5) / 64.0)
      .updated(1, -0.0625).updated(2, 1.0)
    val lineDen = Array.tabulate(20)(i => if (i == 0) 1.0 else ((i * 5) % 5 - 2) / 512.0)
    Rpc(lineOff = 500, sampOff = 500, latOff = 20, longOff = 10, heightOff = 0,
      lineScale = 500, sampScale = 500, latScale = 5, longScale = 5, heightScale = 100,
      lineNum = lineNum, lineDen = lineDen, sampNum = sampNum, sampDen = sampDen)
  }

  /** 33×33 single-band DEMs from nation keys: flat 0 with a square wall
    * ring of height 22+4·(k%11) at Chebyshev distance 3+k%5 around the
    * center. With observer height 2 at the center, visibility is
    * combinatorially determined with structural float margins (see the
    * q98 oracle derivation): interior cells keep adjusted height exactly
    * −2 and propagate minZ = −2·j/(j−1) (margin ≥ 2/32); ring cells are
    * 20–60 above that; behind-ring minZ ≥ (wallH−2)·j/(j−1) ≥ 20 vs −2.
    * Drift ~1e-12 can never flip a verdict. */
  def demsFromNation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/nation.parquet").select(col("n_nationkey").cast("int")).as[Int]
      .map { k =>
        val w = 33
        val dw = 3 + k % 5
        val wallH = 22 + (k % 11) * 4
        val band = new Array[Int](w * w)
        var y = 0
        while (y < w) {
          var x = 0
          while (x < w) {
            if (math.max(math.abs(x - 16), math.abs(y - 16)) == dw) band(y * w + x) = wallH
            x += 1
          }
          y += 1
        }
        (k.toLong, ImageCodec.encodeRaw(Raster(w, w, Array(band))), w, w)
      }
      .toDF("dem_id", "bytes", "w", "h")
  }

  /** 25 simplification subjects from nation keys (q160): even keys are
    * SLIVER boxes (height 1/4 ≪ the tolerance 1) — plain Douglas–Peucker
    * drops both mid corners and collapses the ring to its zero-area
    * chord, so the topology-preserving variant must restore one corner
    * (→ a w·h/2 triangle); odd keys are tall boxes (height 3 > tol),
    * untouched by both. Widths are even integers and heights dyadic, so
    * every expected vertex count and area is exact SQL arithmetic. */
  def sliverBoxesFromNation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/nation.parquet").select(col("n_nationkey").cast("int")).as[Int]
      .map { k =>
        val x0 = (k * 7 % 50).toDouble; val y0 = (k * 11 % 40).toDouble
        val w = (4 + (k % 5) * 2).toDouble
        val h = if (k % 2 == 0) 0.25 else 3.0
        (k.toLong, Wkb.writeBox(x0, y0, x0 + w, y0 + h))
      }
      .toDF("geom_id", "wkb")
  }

  /** 40×40 single-band "pit" rasters from nation keys for the per-RING
    * contour feature oracle (q158): value 200 everywhere except
    * nPits = 1 + k%3 disjoint low rectangles of value 40 (pit p spans
    * x ∈ [4+12p, 4+12p+pw−1], y ∈ [y0, y0+ph−1], pw = 2+(k+p)%3,
    * ph = 2+(2k+p)%3, y0 = 4+k%4). Pits sit ≥ 8 cells apart and ≥ 2
    * from the border, so at level 110 each pit's below-region is an
    * isolated simple ring whose boundary cells all have px ∈
    * [12p+3, 12p+7] — a pit is identified in SQL by (px−3) div 12, and
    * each per-ring area is the per-pit triangle-sum. The above-region is
    * ONE shell (the raster frame) carrying exactly nPits holes. */
  def pitRastersFromNation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/nation.parquet").select(col("n_nationkey").cast("int")).as[Int]
      .map { k =>
        val w = 40
        val band = Array.fill(w * w)(200)
        val nPits = 1 + k % 3
        val y0 = 4 + k % 4
        var p = 0
        while (p < nPits) {
          val x0 = 4 + 12 * p
          val pw = 2 + (k + p) % 3
          val ph = 2 + (2 * k + p) % 3
          var y = y0
          while (y < y0 + ph) {
            var x = x0
            while (x < x0 + pw) { band(y * w + x) = 40; x += 1 }
            y += 1
          }
          p += 1
        }
        (k.toLong, ImageCodec.encodeRaw(Raster(w, w, Array(band))), w, w)
      }
      .toDF("key", "bytes", "w", "h")
  }

  /** 25 IVF coarse-quantizer centroids from nation keys; component i of
    * centroid j is ((j·31 + i·17) mod 64 − 32)/32 — a dyadic rational
    * exact in BOTH float and double, so the quantized distance algebra is
    * bit-identical between the engine and the SQL oracle. */
  def centroidsFromNation(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").cast("int").as("cent_id"),
        expr("transform(sequence(0, 63), i -> " +
          "cast(cast((n_nationkey*31 + i*17) % 64 - 32 as double)/32 as float))").as("cent_emb"))

  /** 33×33 geolocation arrays sampled from an EXACT affine map with
    * dyadic coefficients — X(i,j) = 2 + i/4 + j/8, Y(i,j) = −5 + i/8 + j/2
    * — at PIXEL_STEP = LINE_STEP = 2, PIXEL_OFFSET = 0.5, LINE_OFFSET = 1.
    * Bilinear interpolation of an affine grid IS the affine map, so the
    * forward transform is SQL-closed-form at every raster point and the
    * exact inverse-bilinear solve roundtrips to the inputs (q124). Every
    * grid value, step, and offset is an exact double. */
  lazy val benchGeoLoc: graft.core.GeoLoc = {
    val gw = 33; val gh = 33
    val xs = new Array[Double](gw * gh)
    val ys = new Array[Double](gw * gh)
    var j = 0
    while (j < gh) {
      var i = 0
      while (i < gw) {
        xs(j * gw + i) = 2.0 + i / 4.0 + j / 8.0
        ys(j * gw + i) = -5.0 + i / 8.0 + j / 2.0
        i += 1
      }
      j += 1
    }
    graft.core.GeoLoc(xs, ys, gw, gh,
      pixelOffset = 0.5, lineOffset = 1.0, pixelStep = 2.0, lineStep = 2.0)
  }

  /** Per nation key, a 96×96 single-band scene pair for the SURF
    * correlator (q125): an L-shaped blob and a diagonal staircase blob of
    * 255s on a 0 background at (cx, cy) = (30 + k%7, 30 + 3k%9 stays %7),
    * with the B image translated by (dx, dy) = (3 + k%5, 2 + 7k%5). Both
    * blobs plus every keypoint's full 40×40 descriptor window stay
    * interior in BOTH images, so extraction is translation-equivariant
    * and every match displacement equals the known shift —
    * SimpleSurfSpec pins this for all 25 keys. */
  def surfScenesFromNation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/nation.parquet").select(col("n_nationkey").cast("int")).as[Int]
      .map { k =>
        val w = 96
        val cx = 30 + k % 7; val cy = 30 + (k * 3) % 7
        val dx = 3 + k % 5; val dy = 2 + (k * 7) % 5
        def scene(ox: Int, oy: Int): Array[Byte] = {
          val band = new Array[Int](w * w)
          def sq(x0: Int, y0: Int, sw: Int, sh: Int, v: Int): Unit = {
            var y = y0
            while (y < y0 + sh) {
              var x = x0
              while (x < x0 + sw) { band((y + oy) * w + (x + ox)) = v; x += 1 }
              y += 1
            }
          }
          sq(cx - 4, cy - 3, 7, 7, 255)
          sq(cx - 1, cy - 3, 4, 3, 0) // notch → L-shape
          val bx = cx - 2; val by = cy + 16
          sq(bx, by, 4, 4, 255); sq(bx + 3, by + 3, 4, 4, 255); sq(bx + 6, by + 6, 4, 4, 255)
          ImageCodec.encodeRaw(Raster(w, w, Array(band)))
        }
        (k.toLong, scene(0, 0), scene(dx, dy), w, w)
      }
      .toDF("key", "bytes_a", "bytes_b", "w", "h")
  }

  /** PQ codebooks for the IVF-PQ index (q127): 8 subspaces × 16 codes ×
    * 8 dims, entry (s,c,i) = ((7s + 13c + 5i) mod 32 − 16)/64 — a dyadic
    * rational exact in BOTH float and double, so the residual-encode and
    * ADC distance algebra is bit-identical between the engine and the
    * SQL oracle (the q99/centroid discipline). */
  lazy val pqCodebooks: Array[Array[Array[Float]]] =
    Array.tabulate(8, 16, 8)((s, c, i) =>
      (((s * 7 + c * 13 + i * 5) % 32) - 16) / 64.0f)

  /** RPC probe points: lon ∈ [5,15], lat ∈ [15,25], h ∈ [−40,40] — all
    * inside the benchRpc validity domain (|normalized| ≤ 1). Every op here
    * is mirrored verbatim in the q95 oracle SQL. */
  def rpcPointsFromOrders(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("id"),
        (lit(5.0) + ((col("o_orderkey") * 13) % 101).cast("double") / 10.0).as("lon"),
        (lit(15.0) + ((col("o_orderkey") * 7) % 101).cast("double") / 10.0).as("lat"),
        (((col("o_orderkey") * 3) % 81) - 40).cast("double").as("h"))
}
