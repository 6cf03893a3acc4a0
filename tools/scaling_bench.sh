#!/bin/bash
# North-rule scaling evidence with one FRESH JVM per parallelism level
# (same-JVM sequential sessions leak JIT warm state into later levels).
# Each rung is BANDWIDTH-GATED by graft.ScalingBench itself (BwProbe
# before and after the rung, bw_gated in the JSON) and uses min-wall
# over SPARK_GRAFT_BENCH_PASSES runs. Samples are APPENDED to
# BENCH/scaling_samples.jsonl; BENCH/BASELINE.md is hand-curated from
# them — this script never overwrites it.
# Usage: tools/scaling_bench.sh [N_IMAGES] [N_PAIRS] [LO] [HI]
set -e
cd "$(dirname "$0")/.."
N=${1:-72000}
PAIRS=${2:-1}
LO=${3:-4}
HI=${4:-16}
export SPARK_GRAFT_BENCH_N=$N
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-100g}
mkdir -p BENCH
out=BENCH/scaling_samples.jsonl
for i in $(seq 1 "$PAIRS"); do
  for cpus in "$LO" "$HI"; do
    line=$(sbt -batch "runMain graft.ScalingBench $cpus" 2>/dev/null | grep -o '{"cpus".*}')
    echo "$line" | python3 -c "import json,sys,time; d=json.load(sys.stdin); d['n']=$N; d['ts']=time.strftime('%Y-%m-%dT%H:%M:%SZ',time.gmtime()); print(json.dumps(d))" >> "$out"
    echo "$line"
  done
done
python3 - "$out" "$LO" "$HI" "$N" <<'PY'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
lo, hi, n = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
# only rungs from the SAME corpus size are comparable (fixed per-job
# overhead scales differently with N)
rows = [r for r in rows if r.get("n") == n]
# pair consecutive lo,hi rungs in file order
pairs, pend = [], None
for r in rows:
    if r["cpus"] == lo:
        pend = r
    elif r["cpus"] == hi and pend is not None:
        pairs.append((pend, r)); pend = None
print(f"\n== {len(pairs)} pair(s) on record at n={n} ({sys.argv[1]}) ==")
for a, b in pairs:
    eff = (b["thr"] / a["thr"]) / (hi / lo)
    gate = "gated" if a.get("bw_gated") and b.get("bw_gated") else "UNGATED"
    print(f"local[{lo}] {a['thr']:.1f} -> local[{hi}] {b['thr']:.1f} img/s  eff={eff:.3f}  [{gate}]"
          f"  bw lo:{a.get('bw_pre_t4_gbps')}/{a.get('bw_pre_t16_gbps')}->{a.get('bw_post_t4_gbps')}/{a.get('bw_post_t16_gbps')}"
          f" hi:{b.get('bw_pre_t4_gbps')}/{b.get('bw_pre_t16_gbps')}->{b.get('bw_post_t4_gbps')}/{b.get('bw_post_t16_gbps')}")
gp = [(a, b) for a, b in pairs if a.get("bw_gated") and b.get("bw_gated")]
best_lo = max((a["thr"] for a, _ in gp), default=None)
best_hi = max((b["thr"] for _, b in gp), default=None)
if best_lo and best_hi:
    print(f"min-wall estimator (best GATED rungs): {best_lo:.1f} -> {best_hi:.1f}  eff={(best_hi/best_lo)/(hi/lo):.3f}")
if gp:
    ge = sorted(((b["thr"]/a["thr"])/(hi/lo) for a, b in gp))
    print(f"gated pairs: {len(gp)}, median eff={ge[len(ge)//2]:.3f}, best={ge[-1]:.3f}")
PY
