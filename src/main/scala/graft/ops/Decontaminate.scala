package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.textfunctions._

/** Benchmark decontamination for training-data pipelines: flag corpus
  * documents sharing word-n-grams with a held-out benchmark/eval set —
  * the standard pre-training hygiene step (n-gram overlap against eval
  * suites, as published for GPT-3/PaLM/Llama data pipelines).
  *
  * Scale shape: the benchmark side is SMALL by construction (eval suites
  * are thousands of documents; the corpus is the 100 TB side). Two paths,
  * same result:
  *
  *  - [[flag]] (default): collect the benchmark's distinct gram hashes
  *    once (guarded; eval suites fit by definition), broadcast the sorted
  *    array, and probe per corpus row inside whole-stage codegen — ZERO
  *    shuffle on the corpus, one map pass, no join, no groupBy. This is
  *    the plan you want at 100 TB.
  *  - [[flagJoin]]: the distributed fallback when the benchmark outgrows
  *    the broadcast guard — explode corpus grams, broadcast-join against
  *    the distinct benchmark grams, re-aggregate per document. Only
  *    MATCHED grams reach the aggregation shuffle; totals ride a per-row
  *    expression, and zero-match documents are recovered without a second
  *    corpus shuffle (the per-doc frame keeps (id, total) from the scan).
  *
  * Output per corpus document: (id, total_grams, matched_grams,
  * contaminated 0/1). Documents shorter than n words carry their full
  * token sequence as one gram (exact-match semantics for short rows).
  */
object Decontaminate {

  /** Sorted distinct word-n-gram hashes of the benchmark set, collected
    * with a fail-fast guard. At `maxGrams` = 32M the array is 256 MB —
    * past that, use [[flagJoin]] (named in the error). */
  def benchGrams(bench: DataFrame, textCol: String, n: Int,
                 maxGrams: Int = 32 << 20): Array[Long] = {
    val rows = bench.select(explode(word_ngrams(col(textCol), n)).as("g"))
      .distinct()
      .limit(maxGrams + 1)
      .collect()
    require(rows.length <= maxGrams,
      s"benchmark n-gram set exceeds $maxGrams distinct grams; " +
        "use Decontaminate.flagJoin (distributed) instead of the broadcast probe")
    val arr = rows.map(_.getLong(0))
    java.util.Arrays.sort(arr)
    arr
  }

  /** Shuffle-free broadcast-probe path. */
  def flag(corpus: DataFrame, bench: DataFrame, n: Int,
           idCol: String = "doc_id", textCol: String = "text",
           maxGrams: Int = 32 << 20): DataFrame = {
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(benchGrams(bench, textCol, n, maxGrams))
    corpus.select(col(idCol),
        ngram_hits(col(textCol), n, bc).as("ht"))
      .select(col(idCol),
        col("ht").getItem(1).as("total_grams"),
        col("ht").getItem(0).as("matched_grams"),
        when(col("ht").getItem(0) > 0, 1).otherwise(0).as("contaminated"))
  }

  /** Distributed fallback: explode + broadcast-join + per-doc count.
    * Identical output to [[flag]] (asserted by TextOpsSpec). */
  def flagJoin(corpus: DataFrame, bench: DataFrame, n: Int,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bg = bench.select(explode(word_ngrams(col(textCol), n)).as("g")).distinct()
    val perDoc = corpus.select(col(idCol),
      word_ngrams(col(textCol), n).as("grams"))
    val hits = perDoc.select(col(idCol), explode(col("grams")).as("g"))
      .join(broadcast(bg), Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("matched_grams"))
    perDoc.select(col(idCol), size(col("grams")).as("total_grams"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("total_grams"),
        coalesce(col("matched_grams"), lit(0)).as("matched_grams"),
        when(coalesce(col("matched_grams"), lit(0)) > 0, 1).otherwise(0).as("contaminated"))
  }
}
