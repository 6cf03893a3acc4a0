package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-round benchmark main (driver contract): times the headline queries
  * on SPARK_GRAFT_SF_DIR and the flagship image pipeline, prints ONE JSON
  * line. `value` = total seconds over the headline set; extra key
  * `pipeline_images_per_sec` carries the north-rule throughput metric.
  *
  * The emitted line is a GATED artifact (round-3 bwgate methodology,
  * BENCH/BASELINE.md): a memory-bandwidth probe runs before and after
  * the timed region (`bw_pre_*` / `bw_post_*` GiB/s fields, `bw_gated`
  * = both healthy) and every query is timed over SPARK_GRAFT_BENCH_PASSES
  * (default 2) passes with the MINIMUM wall reported — steal only ever
  * ADDS time, so min-wall is the noise-robust estimator on this host.
  */
object Bench {
  val Headline: Seq[String] = Seq(
    "q01_summary_agg", "q02_groupby_agg", "q07_join_inner", "q10_window_topk",
    "q16_events_window", "q20_cell_encode", "q21_tile_assign", "q22_pip_join",
    "q24_crs_3857", "q25_knn", "q26_grid_metrics", "q27_tile_pyramid_counts",
    "q28_rasterize_count", "q30_image_stats", "q31_tile_pyramid",
    "q35_focal_dem", "q36_sample_at", "q38_contour",
    "q40_dedup_exact", "q44_cosine_topk", "q46_minhash_lsh", "q50_ann_lsh",
    // round-2 operator families
    "q61_layer_intersection", "q64_dissolve", "q67_zonal_full", "q70_grid_nearest",
    // round-3 operator families
    "q85_sql_intersects_join", "q86_line_clip", "q87_buffer", "q88_grid_linear",
    "q89_density_mosaic", "q90_grid_data_metrics", "q92_make_valid",
    "q93_gcp_poly", "q95_rpc_forward", "q96_point_overlay", "q97_pansharpen",
    // round-4 operator families
    "q39_contour_polygons", "q99_ivf_topk", "q101_gcp_warp_tiles",
    "q102_concave_hull", "q103_grid_linear_tiled", "q104_incremental_tiles",
    "q105_cosine_neardup", "q106_color_relief", "q107_hillshade_modes",
    "q108_zt_family", "q109_tpi_tri", "q110_aspect", "q111_focal_stats",
    "q112_raster_blend",
    "q113_phash_neardup", "q114_phash_clusters", "q115_bm25_topk",
    "q116_stratified_sample", "q117_stratified_topk", "q118_dedup_pipeline",
    "q119_decontaminate", "q120_repetition", "q121_nearblack",
    "q122_homography", "q123_los", "q124_geoloc", "q125_surf_match",
    "q126_suggested_output", "q127_ivfpq_topk", "q128_equalize", "q129_segment_dedup",
    "q130_kmeans", "q131_semdedup", "q132_gopher_filter", "q133_temperature_mix", "q134_pii_mask", "q135_hist_match", "q136_aspect_batches",
    "q137_raster_compare", "q138_xyz_extract", "q139_dsir_topk", "q140_voronoi_assign", "q141_label_outliers", "q142_image_chips",
    "q143_gcp_refine", "q144_shard_pack", "q145_image_quality", "q146_caption_align",
    "q147_bpe_tokens", "q148_augment", "q149_resize_crop", "q150_norm_stats",
    "q151_scale_stretch", "q152_leakage_split", "q153_ann_recall",
    "q154_epoch_shuffle", "q155_contour_rings", "q156_sequence_pack",
    "q157_spatial_split",
    // round-5 operator families
    "q158_contour_ring_features", "q159_tps_warp_tiles", "q160_simplify_topo",
    "q161_rpc_warp_tiles", "q162_join_first_match",
    "q163_asof_join", "q164_interval_join", "q165_rollup",
    "q166_hll_distinct", "q167_token_quantiles", "q168_cms_heavyhitters",
    "q169_cell_skew_profile", "q170_hex_bin", "q171_hex_smooth",
    "q172_hex_pip_join")

  def buildSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("gdalspark-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** North-rule pipeline: decode→stats → footprint → cell/PIP join →
    * tile-assign → warp each image onto its z6 tiles → per-tile mosaic →
    * checksums. Returns (images, elapsedSec). Generation is materialized
    * (persist+count) BEFORE the timer: corpus synthesis is not pipeline
    * work. */
  def pipelineThroughput(spark: SparkSession, n: Long): (Long, Double) = {
    import graft.expr.functions._
    val images = graft.gen.Fixtures.imagesFromRange(spark, n,
      spark.sparkContext.defaultParallelism)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nImages = images.count()
    val regions = regionsDf(spark)
    val t0 = System.nanoTime()
    // stats + footprint + the region PIP probe all ride ONE codegen span
    // over the persisted corpus: the region layer is dim-sized, so the
    // join is a broadcast STR-tree probe (envMatchIndexed) — the former
    // envJoin + dropDuplicates shape shuffled image BYTES through a
    // cell-explode Exchange and TWO dedup Exchanges; now zero shuffle
    // before the single tile-key Exchange in baseTiles
    val joined = images
      .withColumn("stats", image_stats(col("bytes"), col("fmt"), col("w"), col("h")))
      .withColumn("env", footprint(col("gt"), col("w"), col("h"), col("srid")))
      .filter(col("stats")(0) >= 1)
      .transform(df => graft.ops.SpatialJoin.envMatchIndexed(df, regions))
      .filter(col("n_regions") >= 1) // render each matched image once
    val tiles = graft.ops.Tiling.baseTiles(joined, z = 6, kernel = "near")
      .withColumn("cks", planes_checksums(col("buf")))
      .select(col("tile"), col("n_images"), col("cks"))
    tiles.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    images.unpersist()
    (nImages, sec)
  }

  def regionsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 25).map { k =>
      val (minx, miny, maxx, maxy) = graft.gen.Fixtures.regionBoxesSpec(k)
      (k.toLong, graft.core.Wkb.writeBox(minx, miny, maxx, maxy))
    }.toDF("region_id", "wkb")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt)
    val (bwPre4, bwPre16) = graft.tools.BwProbe.pair()
    val spark = buildSession(cpus)
    val qs = SparkEntry.queries
    // untimed warm-up: parquet footers, codegen, corpus materialization
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    graft.gen.Fixtures.imagesFromParts(spark, sfDir)
    // optional focus list for iterating on specific queries' cost
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = Headline.filter(qs.contains)
      .filter(n => only.forall(_.contains(n))).map { name =>
      val walls = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case _: Throwable => false }
          finally graft.pipeline.Caches.release()
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      // min over the SUCCESSFUL walls (a transient single-pass failure must
      // not silently drop the query from the total); -1 only if all fail
      val good = walls.filter(_ >= 0)
      name -> (if (good.isEmpty) -1.0 else good.min)
    }
    val benchN = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "8000").toLong
    val (nImages, pipeSec) = (1 to passes).map(_ => pipelineThroughput(spark, benchN)).minBy(_._2)
    val ips = nImages / pipeSec
    spark.stop()
    val (bwPost4, bwPost16) = graft.tools.BwProbe.pair()
    val gated = graft.tools.BwProbe.healthy(bwPre4, bwPre16) &&
      graft.tools.BwProbe.healthy(bwPost4, bwPost16)
    val qJson = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum + pipeSec
    println(f"""{"metric":"headline_total","value":$total%.3f,"unit":"sec","queries":$qJson,"sf":"$sfDir","pipeline_images":$nImages,"pipeline_sec":$pipeSec%.3f,"pipeline_images_per_sec":$ips%.1f,"cpus":"$cpus","passes":$passes,"bw_pre_t4_gbps":$bwPre4%.1f,"bw_pre_t16_gbps":$bwPre16%.1f,"bw_post_t4_gbps":$bwPost4%.1f,"bw_post_t16_gbps":$bwPost16%.1f,"bw_gated":$gated}""")
  }
}
