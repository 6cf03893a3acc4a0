package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expr.{DensityMosaic, PlaneBuf}

/** Density-mask mosaic (alg/gdalwarpkernel.cpp UnifiedSrcDensity analog,
  * reformulated commutative/associative): merge order and partial-agg
  * splits must be bit-identical, and the blended value must equal the
  * integer round-half-up of the density-weighted mean. */
class DensityMosaicSpec extends AnyFunSuite {
  private val Px = PlaneBuf.PlanePx

  /** 4-plane buffer (3 bands + density), constant band value + density
    * over a pixel index range [from, until). */
  private def buf(v: Int, d: Int, from: Int, until: Int): Array[Byte] = {
    val b = new Array[Byte](4 * Px)
    for (i <- from until until) {
      b(i) = v.toByte; b(Px + i) = v.toByte; b(2 * Px + i) = v.toByte
      b(3 * Px + i) = d.toByte
    }
    b
  }

  test("two half-transparent overlapping images blend identically in both orders") {
    val a = buf(100, 128, 0, 1000)
    val b = buf(200, 128, 500, 1500)
    val ab = DensityMosaic.blend(Iterator(a, b))
    val ba = DensityMosaic.blend(Iterator(b, a))
    assert(java.util.Arrays.equals(ab, ba), "merge order changed the tile")
    // overlap [500,1000): v = round((128*100 + 128*200) / 256) = 150
    assert((ab(750) & 0xFF) == 150)
    // density saturates: 128 + 128 = 256 -> 255
    assert((ab(3 * Px + 750) & 0xFF) == 255)
    // exclusive regions keep their value, density 128
    assert((ab(10) & 0xFF) == 100 && (ab(3 * Px + 10) & 0xFF) == 128)
    assert((ab(1200) & 0xFF) == 200 && (ab(3 * Px + 1200) & 0xFF) == 128)
    // untouched pixels stay zero
    assert(ab(2000) == 0 && ab(3 * Px + 2000) == 0)
  }

  test("associativity: (a+b)+c == a+(b+c) == any partial-agg split") {
    val a = buf(10, 30, 0, 800)
    val b = buf(250, 200, 400, 1200)
    val c = buf(77, 55, 600, 900)
    val accAB = DensityMosaic.accumulate(DensityMosaic.accumulate(Array.emptyLongArray, a), b)
    val accC = DensityMosaic.accumulate(Array.emptyLongArray, c)
    val split1 = DensityMosaic.finishAcc(DensityMosaic.combine(accAB, accC))
    val accA = DensityMosaic.accumulate(Array.emptyLongArray, a)
    val accBC = DensityMosaic.accumulate(DensityMosaic.accumulate(Array.emptyLongArray, b), c)
    val split2 = DensityMosaic.finishAcc(DensityMosaic.combine(accA, accBC))
    val serial = DensityMosaic.blend(Iterator(a, b, c))
    assert(java.util.Arrays.equals(split1, split2))
    assert(java.util.Arrays.equals(split1, serial))
    // triple-overlap value: round((30*10 + 200*250 + 55*77) / 285) = round(54535/285)
    val expect = ((2L * (30 * 10 + 200 * 250 + 55 * 77) + 285) / (2 * 285)).toInt
    assert((split1(700) & 0xFF) == expect)
  }

  test("weighted mean is exact round-half-up, never truncation") {
    // d1=1,v1=0; d2=1,v2=1 -> mean 0.5 -> rounds to 1
    val a = buf(0, 1, 0, 10)
    val b = buf(1, 1, 0, 10)
    val m = DensityMosaic.blend(Iterator(a, b))
    assert((m(5) & 0xFF) == 1)
  }

  test("zero-density pixels contribute nothing") {
    val a = buf(123, 0, 0, 100) // fully transparent
    val b = buf(45, 9, 50, 60)
    val m = DensityMosaic.blend(Iterator(a, b))
    assert((m(10) & 0xFF) == 0 && (m(3 * Px + 10) & 0xFF) == 0)
    assert((m(55) & 0xFF) == 45 && (m(3 * Px + 55) & 0xFF) == 9)
  }

  test("Spark aggregate path: udaf equals serial blend across partitionings") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(5)
    val bufs = (0 until 12).map { k =>
      buf(rnd.nextInt(256), 1 + rnd.nextInt(255), rnd.nextInt(Px / 2), Px / 2 + rnd.nextInt(Px / 2))
    }
    val serial = DensityMosaic.blend(bufs.iterator)
    for (parts <- Seq(1, 3, 12)) {
      val got = bufs.map(b => (1, b)).toDF("g", "buf").repartition(parts)
        .groupBy($"g")
        .agg(graft.expr.functions.mosaic_density_agg($"buf").as("m"))
        .collect()(0).getAs[Array[Byte]]("m")
      assert(java.util.Arrays.equals(got, serial), s"parts=$parts diverged from serial")
    }
  }
}
