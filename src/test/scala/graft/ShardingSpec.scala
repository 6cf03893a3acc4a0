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

  test("packSequences: bins tile the token stream with zero padding") {
    val cap = 100L
    val rows = (0 until 400).map(i => (i.toLong, (i * 37L) % 250 + 1))
    val got = Sharding.packSequences(rows.toDF("id", "ntok"), "id", "ntok", cap,
        expr("id div 32"))
      .select(col("id"), col("ntok"), col("tok_offset"), col("start_bin"),
        col("end_bin"), col("bins_spanned"), col("start_off_in_bin"))
      .as[(Long, Long, Long, Long, Long, Int, Int)].collect().sortBy(_._1)
    // offsets are the exclusive prefix scan; spans follow from them
    var cum = 0L
    got.foreach { case (id, n, off, sb, eb, span, inBin) =>
      assert(off == cum, s"id=$id")
      assert(sb == off / cap && eb == (off + n - 1) / cap)
      assert(span == (eb - sb + 1) && inBin == (off % cap))
      cum += n
    }
    // every bin before the last is fully covered (the zero-padding claim)
    val total = cum
    val lastBin = (total - 1) / cap
    assert(got.map(_._5).max == lastBin)
    // docs spanning >1 bin exist in this fixture (capacity < max ntok)
    assert(got.exists(_._6 > 1))
  }

  test("packSequences drops zero-token docs and keeps the stream contiguous") {
    val rows = Seq((1L, 5L), (2L, 0L), (3L, 7L)).toDF("id", "ntok")
    val got = Sharding.packSequences(rows, "id", "ntok", 8L, expr("0"))
      .select(col("id"), col("tok_offset")).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 3L -> 5L))
  }
}
