package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.textfunctions.{sample_bucket, smix64, smix64_add}

/** Deterministic sampling for training-data mixture construction.
  *
  * All variants key on `sample_bucket(id)` — the splitmix64-mixed unsigned
  * residue of the row id in [0, 1e6) — NOT on Spark's `sample()`: the
  * built-in draws from a partition-index-seeded RNG, so its selection
  * changes under repartitioning, AQE re-planning and task retries. A
  * content-keyed threshold is reproducible across runs, engines and
  * cluster sizes, and lets two pipelines (or a resume-from-checkpoint)
  * agree on the sample without coordination.
  *
  * Scale shape: rate-based variants are codegen'd map-only filters (no
  * shuffle, no state); the exact-k variant shuffles once, keyed by
  * stratum, and its per-group window never sees more than one stratum.
  */
object Sampling {

  /** Keep ~ratePpm/1e6 of rows, deterministically by id. */
  def hashSample(df: DataFrame, idCol: String, ratePpm: Long): DataFrame = {
    require(ratePpm >= 0 && ratePpm <= 1000000, "ratePpm in [0, 1e6]")
    df.withColumn("bucket", sample_bucket(col(idCol)))
      .filter(col("bucket") < ratePpm)
  }

  /** Per-stratum ppm rates (the "mix recipe": e.g. keep 25% of en docs,
    * 75% of de). Strata absent from `rates` keep `defaultPpm`. The rate
    * table rides the plan as a CASE expression — broadcast-free. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       ratesPpm: Map[String, Long], defaultPpm: Long = 0L): DataFrame = {
    require((ratesPpm.values ++ Seq(defaultPpm)).forall(r => r >= 0 && r <= 1000000),
      "ppm rates in [0, 1e6]")
    val rateCol = ratesPpm.foldLeft(lit(defaultPpm)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("bucket", sample_bucket(col(idCol)))
      .withColumn("rate_ppm", rateCol)
      .filter(col("bucket") < col("rate_ppm"))
  }

  /** Temperature-reweighted mixture sampling (the data-mixing move of the
    * GPT-3/PaLM recipes at α = 1/2): per-stratum quotas ∝ n_d^α flatten
    * the mixture so rare domains are over-represented relative to their
    * natural share. Exactness discipline: s_d = floor(sqrt(n_d)·2^20) is
    * int64 (sqrt is IEEE correctly-rounded in every engine, ·2^20 is an
    * exponent shift, floor exact), Σ s_d is an order-free integer sum,
    * and quota_d = (total·s_d) div Σ s_d is integer division — the whole
    * quota derivation is bit-mirrorable SQL. Row selection inside a
    * stratum is the deterministic (bucket, id) hash order of
    * [[stratifiedTopK]].
    *
    * Scale shape: the counts/quota frame is one two-phase hash-agg down
    * to |strata| rows (broadcast back onto the corpus); rank WITHIN a
    * stratum comes from [[graft.ops.Sharding.groupedRank]]'s two-phase
    * prefix, NOT a per-stratum window — the quota here is a COLUMN, so
    * Spark's WindowGroupLimit map-side pruning can never apply, and a
    * dominant stratum (one web domain at 40% of a real corpus) would
    * otherwise sort through one task. With the prefix, the hot stratum's
    * sort spreads across the sub-buckets. A quota above |stratum| keeps
    * the whole stratum. */
  def temperatureMix(df: DataFrame, idCol: String, stratumCol: String,
                     total: Long, subBuckets: Int = 256): DataFrame = {
    require(total >= 0, "non-negative target total")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("s_q", floor(sqrt(col("n_docs").cast("double")) * (1L << 20)).cast("long"))
    val tot = counts.agg(sum(col("s_q")).as("s_tot"))
    val quotas = counts.crossJoin(tot)
      .withColumn("quota", expr(s"($total * s_q) div s_tot"))
      .select(col(stratumCol), col("quota"))
    val ranked = Sharding.groupedRank(
      df.withColumn("bucket", sample_bucket(col(idCol))),
      Seq(stratumCol), hashCol = "bucket", orderCol = idCol, subBuckets = subBuckets)
    val outCols = (df.columns :+ "bucket" :+ "quota").map(col) :+ col("rk").cast("int").as("rk")
    ranked
      .join(broadcast(quotas), Seq(stratumCol))
      .filter(col("rk") <= col("quota"))
      .select(outCols: _*)
  }

  /** EXACTLY min(k, |stratum|) rows per stratum, chosen deterministically
    * by hash order (bucket, id) — the "k examples per class" primitive.
    * One shuffle keyed by stratum. */
  def stratifiedTopK(df: DataFrame, idCol: String, stratumCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(col("bucket"), col(idCol))
    df.withColumn("bucket", sample_bucket(col(idCol)))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
  }

  /** Epoch-reproducible training shuffle: for each epoch, every row gets
    * a pseudorandom (shard, pos) from the splitmix64 mix of
    * `id + epoch·golden` — a fresh deterministic permutation per epoch,
    * reproducible across runs, retries, repartitioning and engines (the
    * property a partition-index-seeded `orderBy(rand())` lacks, and the
    * reason a resumed training job can re-derive exactly which sample it
    * stopped at). `shards` must be a power of two so the unsigned
    * residue equals the signed `pmod` (2^64 ≡ 0 mod 2^k) and the SQL
    * mirror is exact.
    *
    * Scale shape: key and shard are codegen'd maps; the only wide op is
    * ONE Exchange on (epoch, shard) feeding the per-shard rank window —
    * the global sort a naive shuffle would pay never appears, and shard
    * count bounds every sort's width (the WebDataset recipe: shuffle
    * shard order cheaply, sort within shards in parallel). */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Int, shards: Int): DataFrame = {
    require(epochs >= 1, "epochs >= 1")
    require(shards >= 1 && (shards & (shards - 1)) == 0, "shards must be a power of two")
    val withE = df.select(col(idCol))
      .withColumn("epoch", explode(array((0 until epochs).map(e => lit(e)): _*)))
    // seed addition inside smix64_add (JVM, wrapping): a Catalyst add
    // would throw under ANSI if ids ever carry full-range hash values
    val keyed = withE.withColumn("skey",
      smix64_add(col(idCol), col("epoch").cast("long") * lit(0x9E3779B9L)))
    // unsigned order of the raw hash == signed order of (hash ^ MinValue)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("epoch"), col("shard"))
      .orderBy(col("skey").bitwiseXOR(lit(Long.MinValue)), col(idCol))
    keyed.withColumn("shard", pmod(col("skey"), lit(shards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("int"))
      .select(col(idCol), col("epoch"), col("shard"), col("pos"))
  }

  /** Leakage-safe train/val split: assign each row to a split by a
    * deterministic hash of its duplicate-CLUSTER id, never its own id.
    * Splitting by row id leaks near-duplicates across the boundary (a
    * val image whose twin sits in train inflates every eval number);
    * splitting on the connected-component label from
    * [[graft.ops.Components.connectedComponents]] keeps each near-dup
    * cluster atomic, so no Hamming-/Jaccard-linked pair can straddle the
    * cut by construction.
    *
    * The hash is plain modular arithmetic on the component label
    * (`(component·1000003 + salt) mod 1000 < valPermille`), exact in
    * int64 and bit-mirrorable in SQL; component labels are min-reachable
    * ids, so the assignment is stable under repartitioning, retries and
    * resume. Scale shape: a codegen'd map over the (id, component)
    * frame — no shuffle, no state. */
  def leakageSplit(assign: DataFrame, componentCol: String = "component",
                   valPermille: Long = 100L, salt: Long = 0L): DataFrame = {
    require(valPermille >= 0 && valPermille <= 1000, "valPermille in [0, 1000]")
    assign.withColumn("split",
      when(pmod(col(componentCol) * lit(1000003L) + lit(salt), lit(1000L)) < valPermille,
        lit("val")).otherwise(lit("train")))
  }

  /** Spatially-buffered train/val split — the geographic-ML leakage
    * guard: spatial autocorrelation makes a val sample trivially
    * predictable from a train sample in the SAME or an ADJACENT cell, so
    * the split must be by cell (never by row) AND train rows bordering
    * val DATA must be excluded (the buffered spatial cross-validation
    * of Roberts et al. 2017, "blocked CV").
    *
    * Assignment: each row's [[graft.core.CellIndex]] cell at `level`
    * hashes to val/train through splitmix64 of the packed cell id plus
    * the salt (the q154/sample_bucket mixer, bit-mirrored in SQL via the
    * proven HUGEINT limb CTEs). An affine hash here would be
    * lattice-structured — val cells would recur along fixed (dx, dy)
    * directions instead of the random block assignment blocked CV
    * assumes — so a full avalanche mix is load-bearing, not cosmetic.
    * Rows in a train cell Chebyshev-adjacent (ring 1, lon wraps / lat
    * clamps) to any val cell CONTAINING data become 'excluded' —
    * data-aware: empty val cells spread no buffer.
    *
    * Scale shape: cell+hash are codegen'd per-row maps; the val-cell set
    * is a distinct over val rows only (cells ≪ corpus), its 9× ring
    * explode stays cell-sized, and the exclusion attaches through ONE
    * equi-join on the cell key (AQE broadcasts it when small). The
    * corpus is scanned once via the caller-visible persist. */
  def spatialSplit(df: DataFrame, lonCol: String, latCol: String, level: Int,
                   valPermille: Long = 100L, salt: Long = 0L): DataFrame = {
    require(valPermille >= 0 && valPermille <= 1000, "valPermille in [0, 1000]")
    require(level >= 1 && level <= CellIndexMaxLevel, s"level in [1, $CellIndexMaxLevel]")
    val cellCol = graft.expr.functions.cell_of(col(lonCol), col(latCol), level)
    val rows = graft.pipeline.Caches.persist(
      df.withColumn("cell", cellCol)
        .withColumn("split",
          when(pmod(sample_bucket(col("cell") + lit(salt)), lit(1000L)) < valPermille,
            lit("val")).otherwise(lit("train"))))
    val bufferCells = rows.filter(col("split") === "val")
      .select(col("cell")).distinct()
      .select(explode(graft.expr.functions.cell_block(col("cell"), lit(1))).as("bcell"))
      .distinct()
    rows.join(bufferCells, col("cell") === col("bcell"), "left")
      .withColumn("split",
        when(col("split") === "val", lit("val"))
          .when(col("bcell").isNotNull, lit("excluded"))
          .otherwise(lit("train")))
      .drop("bcell")
  }

  private val CellIndexMaxLevel = graft.core.CellIndex.MaxLevel
}
