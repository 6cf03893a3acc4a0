package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Product-quantization kernels (IVF-PQ, q127). */
class PqSpec extends AnyFunSuite {

  private val m = 4
  private val dsub = 4
  private val ksub = 8
  private val cb: Array[Array[Array[Float]]] =
    Array.tabulate(m, ksub, dsub)((s, c, i) =>
      (((s * 7 + c * 13 + i * 5) % 32) - 16) / 64.0f)
  private val qn: Array[Array[Long]] =
    cb.map(_.map(_.map(v => PqKernels.qround(v.toDouble * v * AnnKernels.Scale)).sum))
  private val cent = Array.fill(m * dsub)(0.25f)
  private val model = PqModel(Map(0 -> cent), cb, qn, m, dsub)

  private def enc(emb: Array[Float]): Array[Int] =
    PqKernels.encode(model, new GenericArrayData(emb.map(x => x: Any)), 0)
      .asInstanceOf[GenericArrayData].toIntArray()

  test("a vector sitting exactly on a reconstruction encodes to that code") {
    // emb = cent + cb[s][target_s] per subspace → residual IS the entry
    val target = Array(3, 0, 7, 5)
    val emb = new Array[Float](m * dsub)
    for (s <- 0 until m; i <- 0 until dsub)
      emb(s * dsub + i) = cent(s * dsub + i) + cb(s)(target(s))(i)
    assert(enc(emb).toSeq == target.toSeq)
  }

  test("codes are in range and deterministic") {
    val emb = Array.tabulate(m * dsub)(i => (i * 31 % 17 - 8) / 16.0f)
    val a = enc(emb); val b = enc(emb)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(c => c >= 0 && c < ksub))
  }

  test("ADC of an exactly-reconstructed vector is zero") {
    val target = Array(1, 2, 3, 4)
    // query = reconstruction → every LUT entry at the code is 0
    val lut: Array[Array[Long]] = Array.tabulate(m, ksub) { (s, c) =>
      var acc = 0L
      for (i <- 0 until dsub) {
        // diff between query residual (= cb[s][target_s]) and cb[s][c]
        val diff = cb(s)(target(s))(i).toDouble - cb(s)(c)(i).toDouble
        acc += PqKernels.qround(diff * diff * AnnKernels.Scale)
      }
      acc
    }
    val codes = new GenericArrayData(target.map(x => x: Any))
    val lutArr = new GenericArrayData(lut.map(r => new GenericArrayData(r.map(x => x: Any)): Any))
    assert(PqKernels.adc(codes, lutArr) == 0L)
    // and any off-code LUT row is strictly positive for distinct entries
    assert(lut(0).zipWithIndex.filter(_._2 != target(0)).forall(_._1 > 0L))
  }

  test("qround is half away from zero on both signs") {
    assert(PqKernels.qround(2.5) == 3L && PqKernels.qround(-2.5) == -3L)
    assert(PqKernels.qround(2.4) == 2L && PqKernels.qround(-2.4) == -2L)
  }
}
