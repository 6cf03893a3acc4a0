package graft.tools

import graft.core._

/** No-Spark smoke drive of the core library: synthesize → encode → decode →
  * checksum → reproject → tile-assign → warp. Run: `sbt "runMain graft.tools.Smoke"`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val px = Array.tabulate(400)(i => (i % 20 * 7 + i / 20 * 13) % 256)
    val r = Raster(20, 20, Array(px))
    val png = ImageCodec.encodePng(r)
    println(s"png bytes: ${png.length}")
    val dec = ImageCodec.decode(png, "png", 20, 20)
    println(s"decode exact: ${dec.bands(0).sameElements(px)}")
    println(s"checksum(pattern): ${GdalChecksum.ofInts(dec.bands(0), 20, 20)}")
    // byte.tif's UTM-11 placement (autotest/gcore/data/byte.tif georef)
    val gt = Array(440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    val (minE, minN, maxE, maxN) = GeoTransform.envelope(gt, 20, 20)
    val cs = Seq((minE, minN), (minE, maxN), (maxE, minN), (maxE, maxN)).map { case (e, n) => Utm.inverse(32611, e, n) }
    val mx0 = Mercator.x(cs.map(_._1).min); val mx1 = Mercator.x(cs.map(_._1).max)
    val my0 = Mercator.y(cs.map(_._2).min); val my1 = Mercator.y(cs.map(_._2).max)
    println(s"z11 tile range: ${TileMath.tileRange(mx0, my0, mx1, my1, 11)} (expect (354,818,354,818))")
    val warped = Warp.warp(dec, gt, 32611, TileMath.tileGeoTransform(11, 354, 818), 3857, 256, 256, Warp.Near, nodata = -1)
    println(s"warped valid pixels: ${warped.bands(0).count(_ >= 0)} of 65536")
    println("probe jpeg-as-png: " + (try { ImageCodec.decode(png, "jpeg", 20, 20); "decoded (imageio sniffs real format)" } catch { case e: Exception => s"error: ${e.getMessage}" }))
    println("probe bad raw size: " + (try { ImageCodec.decodeRaw(new Array[Byte](37), 5, 5); "??" } catch { case e: Exception => s"error: ${e.getMessage}" }))
    println("probe degenerate gt invert: " + GeoTransform.invert(Array(0.0, 0, 0, 0, 0, 0)))
    println("probe unsupported srid: " + (try { CrsTransform.toLonLat(9999, 0, 0); "??" } catch { case e: Exception => s"error: ${e.getMessage}" }))
    println("probe truncated wkb: " + (try { Wkb.envelope(Array[Byte](1, 7, 0, 0, 0)); "??" } catch { case e: Exception => s"error: ${e.getClass.getSimpleName}: ${e.getMessage}" }))
  }
}
