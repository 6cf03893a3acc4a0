package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Stage-level timing probe for q118_dedup_pipeline. */
object Q118Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = spark.read.parquet(s"$sf/documents.parquet")
    d.count()
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[q118probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s = $r"); r
    }
    t("full-composed") {
      graft.SparkEntry.queries("q118_dedup_pipeline")(spark, sf)
        .write.format("noop").mode("overwrite").save()
      graft.pipeline.Caches.release()
      "done"
    }
    (1 to 2).foreach { pass =>
      println(s"[q118probe] pass $pass")
      val cand = Dedup.minhashCandidates(d, k = 64, bands = 16, shingle = 5)
        .select(col("id_a"), col("id_b")).persist()
      t("candidates")(cand.count())
      val verified = Dedup.jaccardVerify(cand, d, shingle = 3, minJaccard = 0.5)
        .select(col("id_a"), col("id_b")).persist()
      t("verify")(verified.count())
      val comp = t("components") {
        val c = graft.ops.Components.connectedComponents(
          verified, "id_a", "id_b", d.select(col("doc_id").as("id")), "id")
        c.count()
      }
      cand.unpersist(); verified.unpersist()
    }
    spark.stop()
  }
}
