package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.functions._

/** XYZ tile pyramid over the image corpus (SURVEY.md §2.8 — the
  * distributed restatement of `gdal raster tile`,
  * apps/gdalalg_raster_tile.cpp).
  *
  * Scaling shape mirrors the reference exactly: base zoom = one warp per
  * (image, covering tile) — the reference's per-tile WarpRegionToBuffer
  * (:655-700) becomes a tile-keyed shuffle + mosaic aggregate; overview
  * zoom z−1 tiles reduce 4 z-children each (:1487) — a groupBy(parent)
  * 2×2 aggregate. One tile = one task's worth of work; AQE skew-join/agg
  * splitting handles hot low-zoom tiles.
  *
  * Images DataFrame contract: image_id, bytes, fmt, w, h,
  * gt array<double>[6], srid int.
  */
object Tiling {

  /** [w, h, srid, gt0..gt5] packed for the warp expression. */
  def meta9: Column = array(
    col("w").cast("double"), col("h").cast("double"), col("srid").cast("double"),
    col("gt")(0), col("gt")(1), col("gt")(2), col("gt")(3), col("gt")(4), col("gt")(5))

  /** images → (tile, image rows) assignment at zooms [zmin, zmax] —
    * the GetTileIndices explode. */
  def assign(images: DataFrame, zmin: Int, zmax: Int): DataFrame =
    images
      .withColumn("env", footprint(col("gt"), col("w"), col("h"), col("srid")))
      .withColumn("tile", explode(tile_cover(col("env"), zmin, zmax)))

  /** Base-zoom tiles: warp each image onto its covering tiles, mosaic per
    * tile. Returns (tile, n_images, buf). */
  def baseTiles(images: DataFrame, z: Int, kernel: String = "near"): DataFrame =
    assign(images, z, z)
      .withColumn("buf", warp_tile(col("bytes"), col("fmt"), meta9, col("tile"), lit(kernel)))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n_images"), mosaic_agg(col("buf")).as("buf"))

  /** One overview step: tiles at z → tiles at z−1 (4-child 2×2 reduce). */
  def overviewStep(tiles: DataFrame): DataFrame = {
    val parent =
      shiftleft(tile_z(col("tile")).cast("bigint") - 1, 58)
        .bitwiseOR(shiftleft(shiftrightunsigned(tile_x(col("tile")).cast("bigint"), 1), 29))
        .bitwiseOR(shiftrightunsigned(tile_y(col("tile")).cast("bigint"), 1))
    tiles
      .withColumn("pbuf", downsample_to_parent(col("buf"), col("tile")))
      .withColumn("ptile", parent)
      .groupBy(col("ptile"))
      .agg(sum(col("n_images")).as("n_images"), mosaic_agg(col("pbuf")).as("buf"))
      .withColumnRenamed("ptile", "tile")
  }

  /** Full pyramid zmax→zmin: base tiles once, then iterative 2×2 reduce.
    * Returns the union of all zoom levels (tile, n_images, buf). Caller
    * should checkpoint/persist each level in long pipelines. */
  def pyramid(images: DataFrame, zmin: Int, zmax: Int, kernel: String = "near"): DataFrame = {
    var level = baseTiles(images, zmax, kernel)
    var acc = level
    var z = zmax
    while (z > zmin) {
      level = overviewStep(level)
      acc = acc.union(level)
      z -= 1
    }
    acc
  }

  /** Render tiles to PNG + quadkey — the partitioned tile sink shape
    * (write with .partitionBy("z","x")). */
  def rendered(tiles: DataFrame): DataFrame =
    tiles.select(
      tile_z(col("tile")).as("z"),
      tile_x(col("tile")).as("x"),
      tile_y(col("tile")).as("y"),
      quadkey(tile_z(col("tile")), tile_x(col("tile")), tile_y(col("tile"))).as("qk"),
      col("n_images"),
      encode_png_planes(col("buf")).as("png"))
}
