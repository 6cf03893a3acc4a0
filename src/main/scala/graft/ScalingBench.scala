package graft

/** North-rule scaling evidence: the same pipeline at several parallelism
  * levels (local[N] as the sandbox stand-in for N executors — no real
  * cluster available), reporting throughput at each plus scaling
  * efficiency = (thr_4N / thr_N) / 4 for the N→4N pairs. Emits JSON
  * only — BENCH/BASELINE.md is hand-curated from the gated samples
  * (tools/scaling_bench.sh appends them to BENCH/scaling_samples.jsonl)
  * and is never overwritten by code.
  *
  * Mirrors the reference's relative methodology (pytest-benchmark with
  * NUM_THREADS ∈ {1, ALL_CPUS}, autotest/benchmark/test_gdalwarp.py:45-46).
  *
  * Context measured on this host (java Arrays.fill sweep): memory
  * bandwidth peaks near 16 threads (~46 GB/s) and REGRESSES at 32
  * (~30 GB/s) — so the 8→32 pair undercounts what 4× executors deliver
  * on a real cluster, where each executor brings its own memory bus.
  * The 4→16 pair is the fairer single-box proxy; both are reported.
  */
object ScalingBench {
  private def measure(cpus: String, n: Long): (Long, Double) = {
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt)
    val spark = Bench.buildSession(cpus)
    try {
      // warm-up untimed (JIT + codegen caches); sized to actually heat
      // the warp/decode paths before measuring
      Bench.pipelineThroughput(spark, math.max(500L, n / 8))
      // min-wall over `passes` timed runs: steal only ever ADDS wall
      // time, so the per-rung minimum is the noise-robust statistic
      // (round-3 methodology, BENCH/BASELINE.md)
      (1 to passes).map(_ => Bench.pipelineThroughput(spark, n)).minBy(_._2)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "24000").toLong
    if (args.length == 1) {
      // single-level fresh-JVM mode (tools/scaling_bench.sh drives this so
      // JIT warm-state can't leak between parallelism levels), bandwidth-
      // gated: probe before AND after the rung, emit both in the JSON
      val (pre4, pre16) = graft.tools.BwProbe.pair()
      val (cnt, sec) = measure(args(0), n)
      val (post4, post16) = graft.tools.BwProbe.pair()
      val gated = graft.tools.BwProbe.healthy(pre4, pre16) &&
        graft.tools.BwProbe.healthy(post4, post16)
      println(f"""{"cpus":${args(0)},"images":$cnt,"sec":$sec%.2f,"thr":${cnt / sec}%.1f,"bw_pre_t4_gbps":$pre4%.1f,"bw_pre_t16_gbps":$pre16%.1f,"bw_post_t4_gbps":$post4%.1f,"bw_post_t16_gbps":$post16%.1f,"bw_gated":$gated}""")
      return
    }
    val levels = sys.env.getOrElse("SPARK_GRAFT_LEVELS", "4,8,16,32").split(",").toSeq
    val rows = levels.map { c =>
      val (cnt, sec) = measure(c, n)
      println(f"""{"cpus":$c,"images":$cnt,"sec":$sec%.2f,"thr":${cnt / sec}%.1f}""")
      (c.toInt, cnt, sec, cnt / sec)
    }
    def thr(c: Int) = rows.find(_._1 == c).map(_._4)
    def eff(a: Int, b: Int): Option[Double] =
      for (ta <- thr(a); tb <- thr(b)) yield (tb / ta) / (b.toDouble / a)
    val e416 = eff(4, 16)
    val e832 = eff(8, 32)
    println(f"""{"n":$n,"eff_4_16":${e416.getOrElse(-1.0)}%.3f,"eff_8_32":${e832.getOrElse(-1.0)}%.3f}""")
  }
}
