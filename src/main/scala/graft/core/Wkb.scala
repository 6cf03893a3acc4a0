package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal Simple-Features WKB codec (2-D Point / LineString / Polygon /
  * MultiPolygon), matching the encoding the reference reads/writes
  * (ogr/ogr_geometry.h:454-484). Geometries travel through DataFrames as
  * plain `binary` columns; expressions decode on the fly.
  *
  * `envelope(wkb)` computes the bbox WITHOUT materializing a geometry
  * object — the trick of ogr/ogr_wkb.cpp used by FilterWKBGeometry
  * (ogrlayer.cpp:4080+) that makes the bbox pre-filter nearly free.
  */
object Wkb {
  val PointType = 1
  val LineStringType = 2
  val PolygonType = 3
  val MultiPointType = 4
  val MultiLineStringType = 5
  val MultiPolygonType = 6

  /** A polygon: outer ring first, then holes. Ring = flat Array(x0,y0,x1,y1,…),
    * closed (first point repeated last). */
  final case class Polygon(rings: Array[Array[Double]])

  /** `lines` carries the paths of (Multi)LineString geometries (a single
    * LineString also mirrors its path into `points` for back-compat). */
  final case class Geom(geomType: Int, polygons: Array[Polygon], points: Array[Double],
                        lines: Array[Array[Double]] = Array.empty)

  // ---- writing -------------------------------------------------------------

  def writePoint(x: Double, y: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1: Byte).putInt(PointType).putDouble(x).putDouble(y)
    bb.array()
  }

  def writePolygon(rings: Array[Array[Double]]): Array[Byte] = {
    var size = 9
    rings.foreach(r => size += 4 + 8 * r.length)
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1: Byte).putInt(PolygonType).putInt(rings.length)
    rings.foreach { r =>
      bb.putInt(r.length / 2)
      r.foreach(bb.putDouble)
    }
    bb.array()
  }

  def writeMultiPolygon(polys: Array[Array[Array[Double]]]): Array[Byte] = {
    val parts = polys.map(writePolygon)
    val bb = ByteBuffer.allocate(9 + parts.map(_.length).sum).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1: Byte).putInt(MultiPolygonType).putInt(parts.length)
    parts.foreach(bb.put)
    bb.array()
  }

  /** Axis-aligned box helper (the most common fixture/regions shape). */
  def writeBox(minx: Double, miny: Double, maxx: Double, maxy: Double): Array[Byte] =
    writePolygon(Array(Array(minx, miny, maxx, miny, maxx, maxy, minx, maxy, minx, miny)))

  def writeLineString(coords: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(9 + 8 * coords.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1: Byte).putInt(LineStringType).putInt(coords.length / 2)
    coords.foreach(bb.putDouble)
    bb.array()
  }

  def writeMultiLineString(lines: Array[Array[Double]]): Array[Byte] = {
    val parts = lines.map(writeLineString)
    val bb = ByteBuffer.allocate(9 + parts.map(_.length).sum).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1: Byte).putInt(MultiLineStringType).putInt(parts.length)
    parts.foreach(bb.put)
    bb.array()
  }

  def writeMultiPoint(coords: Array[Double]): Array[Byte] = {
    val n = coords.length / 2
    val bb = ByteBuffer.allocate(9 + n * 21).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1: Byte).putInt(MultiPointType).putInt(n)
    var i = 0
    while (i < n) {
      bb.put(1: Byte).putInt(PointType).putDouble(coords(i * 2)).putDouble(coords(i * 2 + 1))
      i += 1
    }
    bb.array()
  }

  // ---- reading -------------------------------------------------------------

  private def order(b: Array[Byte], off: Int): ByteOrder =
    if (b(off) == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN

  /** 2-D type code. EWKB Z/M/SRID flag bits (0x80000000/0x40000000/
    * 0x20000000) and ISO Z/M offsets (1000/2000/3000) are REJECTED rather
    * than silently parsed as 2-D (coords would be misread otherwise). */
  private def checkedType(raw: Int): Int = {
    if ((raw & 0xE0000000) != 0)
      throw new IllegalArgumentException(f"unsupported EWKB flags in type 0x$raw%08x")
    if (raw > 0xFFFF || raw >= 1000)
      throw new IllegalArgumentException(s"unsupported wkb type $raw (Z/M variants not handled)")
    raw
  }

  def geomType(wkb: Array[Byte]): Int = {
    val bb = ByteBuffer.wrap(wkb, 1, 4).order(order(wkb, 0))
    checkedType(bb.getInt)
  }

  def readPoint(wkb: Array[Byte]): (Double, Double) = {
    val bb = ByteBuffer.wrap(wkb).order(order(wkb, 0))
    bb.get(); bb.getInt()
    (bb.getDouble, bb.getDouble)
  }

  def readPolygon(wkb: Array[Byte]): Polygon = {
    val bb = ByteBuffer.wrap(wkb).order(order(wkb, 0))
    bb.get(); bb.getInt()
    readPolygonBody(bb)
  }

  private def readPolygonBody(bb: ByteBuffer): Polygon = {
    val nRings = bb.getInt
    val rings = new Array[Array[Double]](nRings)
    var r = 0
    while (r < nRings) {
      val nPts = bb.getInt
      val ring = new Array[Double](nPts * 2)
      var i = 0
      while (i < ring.length) { ring(i) = bb.getDouble; i += 1 }
      rings(r) = ring
      r += 1
    }
    Polygon(rings)
  }

  /** Read any supported geometry into polygon list + optional point coords. */
  def read(wkb: Array[Byte]): Geom = {
    val bb = ByteBuffer.wrap(wkb).order(order(wkb, 0))
    bb.get()
    val t = checkedType(bb.getInt)
    t match {
      case PointType =>
        Geom(t, Array.empty, Array(bb.getDouble, bb.getDouble))
      case MultiPointType =>
        val n = bb.getInt
        val coords = new Array[Double](n * 2)
        var i = 0
        while (i < n) {
          val innerOrder = if (bb.get() == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
          bb.order(innerOrder)
          checkedType(bb.getInt)
          coords(i * 2) = bb.getDouble
          coords(i * 2 + 1) = bb.getDouble
          i += 1
        }
        Geom(t, Array.empty, coords)
      case PolygonType =>
        Geom(t, Array(readPolygonBody(bb)), Array.empty)
      case MultiPolygonType =>
        val n = bb.getInt
        val polys = new Array[Polygon](n)
        var i = 0
        while (i < n) {
          // honor each inner geometry's own byte-order byte
          val innerOrder = if (bb.get() == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
          bb.order(innerOrder)
          checkedType(bb.getInt)
          polys(i) = readPolygonBody(bb)
          i += 1
        }
        Geom(t, polys, Array.empty)
      case LineStringType =>
        val nPts = bb.getInt
        val coords = new Array[Double](nPts * 2)
        var i = 0
        while (i < coords.length) { coords(i) = bb.getDouble; i += 1 }
        Geom(t, Array.empty, coords, Array(coords))
      case MultiLineStringType =>
        val n = bb.getInt
        val lines = new Array[Array[Double]](n)
        var i = 0
        while (i < n) {
          val innerOrder = if (bb.get() == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
          bb.order(innerOrder)
          checkedType(bb.getInt)
          val nPts = bb.getInt
          val coords = new Array[Double](nPts * 2)
          var c = 0
          while (c < coords.length) { coords(c) = bb.getDouble; c += 1 }
          lines(i) = coords
          i += 1
        }
        Geom(t, Array.empty, Array.empty, lines)
      case other => throw new IllegalArgumentException(s"unsupported wkb type $other")
    }
  }

  /** (minx,miny,maxx,maxy) streamed directly off the bytes. */
  def envelope(wkb: Array[Byte]): (Double, Double, Double, Double) = {
    val bb = ByteBuffer.wrap(wkb).order(order(wkb, 0))
    bb.get()
    var minx = Double.MaxValue; var miny = Double.MaxValue
    var maxx = -Double.MaxValue; var maxy = -Double.MaxValue
    @inline def take(): Unit = {
      val x = bb.getDouble; val y = bb.getDouble
      if (x < minx) minx = x; if (x > maxx) maxx = x
      if (y < miny) miny = y; if (y > maxy) maxy = y
    }
    def rings(): Unit = {
      val nRings = bb.getInt
      var r = 0
      while (r < nRings) {
        val nPts = bb.getInt
        var i = 0
        while (i < nPts) { take(); i += 1 }
        r += 1
      }
    }
    checkedType(bb.getInt) match {
      case PointType => take()
      case MultiPointType =>
        val n = bb.getInt; var i = 0
        while (i < n) {
          val innerOrder = if (bb.get() == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
          bb.order(innerOrder)
          checkedType(bb.getInt)
          take()
          i += 1
        }
      case LineStringType =>
        val n = bb.getInt; var i = 0
        while (i < n) { take(); i += 1 }
      case MultiLineStringType =>
        val n = bb.getInt; var i = 0
        while (i < n) {
          val innerOrder = if (bb.get() == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
          bb.order(innerOrder)
          checkedType(bb.getInt)
          val m = bb.getInt; var p = 0
          while (p < m) { take(); p += 1 }
          i += 1
        }
      case PolygonType => rings()
      case MultiPolygonType =>
        val n = bb.getInt; var i = 0
        while (i < n) {
          val innerOrder = if (bb.get() == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
          bb.order(innerOrder)
          checkedType(bb.getInt)
          rings()
          i += 1
        }
      case other => throw new IllegalArgumentException(s"unsupported wkb type $other")
    }
    (minx, miny, maxx, maxy)
  }

  /** WKT rendering for test assertions (polygonize goldens). */
  def toWkt(wkb: Array[Byte]): String = {
    val g = read(wkb)
    def ringStr(r: Array[Double]): String =
      r.grouped(2).map(p => s"${fmt(p(0))} ${fmt(p(1))}").mkString("(", ",", ")")
    def polyStr(p: Polygon): String = p.rings.map(ringStr).mkString("(", ",", ")")
    g.geomType match {
      case PointType => s"POINT (${fmt(g.points(0))} ${fmt(g.points(1))})"
      case MultiPointType =>
        g.points.grouped(2).map(p => s"(${fmt(p(0))} ${fmt(p(1))})")
          .mkString("MULTIPOINT (", ",", ")")
      case PolygonType => s"POLYGON ${polyStr(g.polygons(0))}"
      case MultiPolygonType => s"MULTIPOLYGON ${g.polygons.map(polyStr).mkString("(", ",", ")")}"
      case LineStringType => s"LINESTRING ${ringStr(g.points)}"
      case MultiLineStringType =>
        s"MULTILINESTRING ${g.lines.map(ringStr).mkString("(", ",", ")")}"
    }
  }

  private def fmt(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString
}
