package graft.tools

import org.apache.spark.sql.functions._
import graft.text.textfunctions.rademacher_sig

/** Stage-level timing probe for q105_cosine_neardup: how much of the wall
  * is signature compute vs candidate generation vs verify. */
object Q105Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    embs.count()
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[q105probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s = $r"); r
    }
    val nBits = 16; val bands = 4; val rowsPerBand = nBits / bands
    val mask = (1L << rowsPerBand) - 1
    (1 to 2).foreach { pass =>
      println(s"[q105probe] pass $pass")
      val base = graft.pipeline.Spread.toCores(embs).select(
        col("vec_id").as("id"), col("embedding").as("emb"),
        graft.ops.Ann.qnorm("embedding").as("qn"),
        rademacher_sig(
          expr(s"transform(embedding, x -> cast(x as double))"), nBits, 42L).as("__sig"))
        .persist()
      t("sig+persist")(base.count())
      val banded = base.select(col("id"), posexplode(
        expr(s"transform(sequence(0, ${bands - 1}), b -> (__sig >> (b * $rowsPerBand)) & $mask)"))
        .as(Seq("band", "bkey"))).persist()
      t("band+persist")(banded.count())
      val pairs = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
            && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct().persist()
      t("pairs+persist")(pairs.count())
      val tau2 = 0.35 * 0.35
      val verified = pairs
        .join(base.select(col("id").as("id_a"), col("emb").as("__ea"), col("qn").as("qn_a")), Seq("id_a"))
        .join(base.select(col("id").as("id_b"), col("emb").as("__eb"), col("qn").as("qn_b")), Seq("id_b"))
        .withColumn("qdot", graft.ops.Ann.qdot("__ea", "__eb"))
        .filter(col("qdot") >= 0L &&
          col("qdot").cast("double") * col("qdot").cast("double") >=
            (lit(tau2) * col("qn_a").cast("double")) * col("qn_b").cast("double"))
      t("verify")(verified.count())
      t("full-op")(graft.ops.Dedup.cosineNearDup(embs, tau = 0.35, nBits = 16, bands = 4).count())
      base.unpersist(); banded.unpersist(); pairs.unpersist()
    }
    spark.stop()
  }
}
