package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Hilbert curve code (spatial sort key; gdalalg_vector_sort hilbert
  * method / packedrtree.h sort family). */
class HilbertSpec extends AnyFunSuite {

  test("xy2d/d2xy are inverse bijections on the full 2^5 grid") {
    val order = 5
    val n = 1 << order
    val seen = scala.collection.mutable.Set.empty[Long]
    for (y <- 0 until n; x <- 0 until n) {
      val d = Hilbert.xy2d(order, x, y)
      assert(d >= 0 && d < n.toLong * n)
      assert(seen.add(d), s"duplicate code $d")
      assert(Hilbert.d2xy(order, d) == ((x, y)))
    }
  }

  test("consecutive curve positions are grid neighbours (locality)") {
    val order = 6
    val n = 1 << order
    var d = 0L
    var (px, py) = Hilbert.d2xy(order, 0)
    d = 1
    while (d < n.toLong * n) {
      val (x, y) = Hilbert.d2xy(order, d)
      assert(math.abs(x - px) + math.abs(y - py) == 1,
        s"jump at d=$d: ($px,$py)->($x,$y)")
      px = x; py = y
      d += 1
    }
  }

  test("lon/lat mapping clamps and orders nearby points together") {
    assert(Hilbert.ofLonLat(-180.0, 90.0, 10) == Hilbert.ofLonLat(-181.0, 91.0, 10))
    // two points 0.01 deg apart share high-order curve position vs a far point
    val a = Hilbert.ofLonLat(10.0, 10.0, 16)
    val b = Hilbert.ofLonLat(10.01, 10.0, 16)
    val far = Hilbert.ofLonLat(-120.0, -50.0, 16)
    assert(math.abs(a - b) < math.abs(a - far))
  }

  test("spark spatial sort produces compact per-partition extents") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(4)
    val pts = (1 to 4000).map(i =>
      (i.toLong, rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 170 - 85))
      .toDF("id", "lon", "lat")
    val parted = graft.ops.SpatialSort.partitionByHilbert(pts, "lon", "lat", numPartitions = 8)
    val extents = parted
      .groupBy(org.apache.spark.sql.functions.spark_partition_id().as("pid"))
      .agg(org.apache.spark.sql.functions.max($"lon") - org.apache.spark.sql.functions.min($"lon"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)))
      .collect()
    assert(extents.length >= 6, "range partitioning spread across partitions")
    // hilbert slabs are much narrower than the full 360° extent on average
    val avgSpan = extents.map(_.getDouble(1)).sum / extents.length
    assert(avgSpan < 250.0, s"avg lon span $avgSpan not compact")
  }
}
