package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.textfunctions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale shape: every variant reduces to hash-keyed groupBy / equi-join —
  * no pairwise O(n²) stage ever touches the full corpus; candidate
  * generation (LSH bands, simhash chunks) bounds comparisons to colliding
  * buckets only. At 100 TB the band-explode factor (rows × bands) is the
  * only amplification, and bands are small ints.
  */
object Dedup {

  /** Exact dedup on content hash: one row per distinct text, keeping the
    * minimum id (deterministic winner). */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"))

  /** MinHash-LSH candidate pairs: k-hash signature over char shingles,
    * banded into `bands` groups of k/bands rows; pairs colliding in ≥1 band
    * are candidates (classic Broder/LSH; each pair reported once with the
    * number of colliding bands). */
  def minhashCandidates(docs: DataFrame, k: Int = 64, bands: Int = 16, shingle: Int = 5,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val rows = k / bands
    val sig = docs.select(col(idCol).as("id"), minhash_sig(col(textCol), k, shingle).as("sig"))
    val banded = sig.select(col("id"), posexplode(
      // hash each band's slice to one long key
      expr(s"transform(sequence(0, ${bands - 1}), b -> hash(slice(sig, b*$rows + 1, $rows)))")
    ).as(Seq("band", "bkey")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** SimHash near-dup candidates: 64-bit simhash split into 4 16-bit
    * chunks; Hamming distance ≤ 3 ⇒ some chunk equal (pigeonhole) — join
    * on (chunk index, chunk value), verify Hamming ≤ maxHamming. */
  def simhashCandidates(docs: DataFrame, maxHamming: Int = 3,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), simhash64(col(textCol)).as("sh"))
    val chunked = sh.select(col("id"), col("sh"), posexplode(
      expr("transform(sequence(0, 3), c -> (sh >> (c * 16)) & 65535)")).as(Seq("chunk", "ckey")))
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard on candidate pairs (verification stage after any
    * candidate generator): expects (id_a, id_b) plus the docs table. */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, shingle: Int = 3, minJaccard: Double = 0.0,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val d = docs.select(col(idCol), col(textCol))
    pairs
      .join(d.select(col(idCol).as("id_a"), col(textCol).as("__ta")), Seq("id_a"))
      .join(d.select(col(idCol).as("id_b"), col(textCol).as("__tb")), Seq("id_b"))
      .withColumn("__ov", shingle_overlap(col("__ta"), col("__tb"), shingle))
      .withColumn("inter", col("__ov")(0))
      .withColumn("uni", col("__ov")(1))
      .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .drop("__ta", "__tb", "__ov")
  }
}
