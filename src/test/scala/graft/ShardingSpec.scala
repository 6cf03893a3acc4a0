package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Sharding

/** Distributed shard packing vs a sequential driver-side reference. */
class ShardingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic sizes with a skewed tail (a few huge samples)
  private def sizes(n: Int): Seq[(Long, Long)] =
    (0 until n).map { i =>
      val b = (i * 131L) % 887 + 64 + (if (i % 97 == 0) 5000L else 0L)
      (i.toLong, b)
    }

  private def reference(rows: Seq[(Long, Long)], target: Long): Map[Long, (Long, Long)] = {
    var cum = 0L
    rows.sortBy(_._1).map { case (id, b) =>
      val r = (id, (cum, cum / target))
      cum += b
      r
    }.toMap
  }

  test("two-phase pack reproduces the sequential prefix scan exactly") {
    val data = sizes(5000)
    val df = data.toDF("id", "nbytes").repartition(13)
    val got = Sharding.packShards(df, "id", "nbytes", 40000L, expr("id div 256"))
      .select(col("id"), col("cum_before"), col("shard_id"))
      .as[(Long, Long, Long)].collect()
    val ref = reference(data, 40000L)
    assert(got.length == data.length)
    got.foreach { case (id, cum, shard) =>
      assert((cum, shard) == ref(id), s"row $id")
    }
    // streaming-pack shape: shard ids are contiguous from 0, and every
    // shard except the last holds at least the target minus one sample
    val perShard = got.groupBy(_._3).toSeq.sortBy(_._1)
    assert(perShard.map(_._1) == (0L until perShard.length.toLong))
  }

  test("shard assignment is invariant to bucket granularity") {
    val df = sizes(2000).toDF("id", "nbytes")
    def run(b: String) =
      Sharding.packShards(df, "id", "nbytes", 25000L, expr(b))
        .select(col("id"), col("shard_id")).as[(Long, Long)].collect().toMap
    val fine = run("id div 16")
    val coarse = run("id div 1024")
    val one = run("0")
    assert(fine == coarse && fine == one)
  }
}
