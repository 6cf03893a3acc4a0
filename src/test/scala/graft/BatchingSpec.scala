package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Batching
import graft.text.TextKernels

/** Aspect-ratio bucketing + batch packing vs hand-derived expectations. */
class BatchingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("aspectBucket picks the nearest ratio with ties to the lowest index") {
    val df = Seq(
      (1L, 100, 100),  // exactly 1:1 → 0
      (2L, 400, 300),  // exactly 4:3 → 1
      (3L, 300, 400),  // exactly 3:4 → 2
      (4L, 1600, 900), // exactly 16:9 → 3
      (5L, 900, 1600), // exactly 9:16 → 4
      (6L, 115, 100),  // between 1:1 and 4:3, closer to 1:1 (1.15 < 1.1667)
      (7L, 125, 100)   // closer to 4:3
    ).toDF("id", "w", "h")
    val got = df.select(col("id"), Batching.aspectBucket(col("w"), col("h")).as("b"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4, 6L -> 0, 7L -> 1))
    // tie exactly between 1:1 (score |7-6|*144=144) and 4:3 (|21-24|*48=144)
    // → lowest index wins
    val tie = Seq((9L, 7, 6)).toDF("id", "w", "h")
      .select(Batching.aspectBucket(col("w"), col("h"))).head.getInt(0)
    assert(tie == 0)
  }

  test("packBatches emits only full batches in deterministic hash order") {
    // 19 square images → bucket 0; batchSize 8 → 16 rows, batches {0, 1}
    val df = (0L until 19L).map(i => (i, 10, 10)).toDF("id", "w", "h")
    val out = Batching.packBatches(df, "id", "w", "h", batchSize = 8).collect()
    assert(out.length == 16)
    val byBatch = out.groupBy(_.getAs[Int]("batch_id")).view.mapValues(_.length).toMap
    assert(byBatch == Map(0 -> 8, 1 -> 8))
    // member set = the 16 smallest (sampleBucket, id) — the tail 3 dropped
    val kept = out.map(_.getAs[Long]("id")).toSet
    val expect = (0L until 19L).sortBy(i => (TextKernels.sampleBucket(i), i)).take(16).toSet
    assert(kept == expect)
    // partitioning cannot change the packing
    val again = Batching.packBatches(df.repartition(5), "id", "w", "h", batchSize = 8)
      .select("id", "batch_id").as[(Long, Int)].collect().toSet
    assert(again == out.map(r => (r.getAs[Long]("id"), r.getAs[Int]("batch_id"))).toSet)
  }
}
