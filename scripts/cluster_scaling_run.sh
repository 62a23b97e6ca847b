#!/bin/bash
# Multi-executor scaling evidence via REAL spark-submit --py-files on
# local-cluster[N, 2, 2048] — N separate executor JVMs (own memory,
# own python workers, process-boundary shuffle).  The (N, 4N) pair is
# 1 vs 4 executors × 2 cores = 2 vs 8 total cores, the same linear
# hardware region as the local[N] pool (scaling_run.sh); pairs are
# INTERLEAVED and taskset-pinned for the same drift reasons.
#
# This section supplements the standing acceptance statistic (the
# pooled local[N] pairs in BENCH/BASELINE.md) with the north rule's
# literal form: spark-submit --py-files at two cluster sizes.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p BENCH

PAGES="${SPARK_GRAFT_PAGES_PATH:-/tmp/edk_bench_pages_sf0.1_4096}"
PAIRS="${SPARK_GRAFT_CLUSTER_PAIRS:-3}"
SCAN_MULT="${SPARK_GRAFT_SCAN_MULT:-16}"

if [ ! -d "$PAGES" ]; then
  echo "materializing pages table via bench.py..." >&2
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
    SPARK_GRAFT_BENCH_ONLY="pip_join" SPARK_GRAFT_BENCH_RUNS=1 python bench.py > /dev/null 2>&1
fi

bash scripts/make_pyfiles_zip.sh >&2

run_level () {  # n_executors cores_per_exec
  local n=$1 c=$2
  local total=$((n * c))
  taskset -c 0-$((total - 1)) \
    spark-submit --master "local-cluster[$n,$c,2304]" \
      --py-files dist/edk_spark.zip \
      --conf spark.sql.shuffle.partitions=$total \
      --conf spark.executor.memory=2g \
      --driver-memory 4g \
      jobs/north_metric.py "$PAGES" "$SCAN_MULT" 2 2>/dev/null | tail -1
}

PAIR_JSONS=()
for i in $(seq 1 "$PAIRS"); do
  echo "pair $i: 1 executor..." >&2
  PAIR_JSONS+=("$(run_level 1 2)")
  echo "pair $i: 4 executors..." >&2
  PAIR_JSONS+=("$(run_level 4 2)")
done

python3 - "${PAIR_JSONS[@]}" <<'EOF'
import json, sys, datetime
raw = [json.loads(a) for a in sys.argv[1:]]
pairs = [(raw[i], raw[i + 1]) for i in range(0, len(raw), 2)]

def thru(j):
    return j["pip_join_docs_per_sec"]

def median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2

effs = sorted(thru(b) / thru(a) / 4.0 for a, b in pairs)
norm = sorted(
    thru(b) / thru(a) / 4.0 * (a["cpu_calib_iters_per_sec"] / b["cpu_calib_iters_per_sec"])
    for a, b in pairs
)
j1 = max((a for a, _ in pairs), key=thru)
j4 = max((b for _, b in pairs), key=thru)
lines = f"""
## Multi-executor scaling run (spark-submit, local-cluster) {datetime.datetime.utcnow().isoformat()}Z

The north rule's literal configuration: the SAME north-metric job
submitted via ``spark-submit --py-files dist/edk_spark.zip`` at two
cluster sizes — N=1 vs 4N=4 SEPARATE EXECUTOR JVMs (local-cluster
[n,2,2304]; 2 cores each, process-boundary shuffle, the zip actually
shipped to executors), {len(pairs)} interleaved taskset-pinned pairs,
same input table ({j1['pages_rows']:,} stored pages ×{j1['pip_join_docs']//max(j1['pages_rows'],1)}
self-union = {j1['pip_join_docs']:,} docs/pass).

| executors | cores | pip_join s (best) | docs/s |
|---|---|---|---|
| 1 (N)  | 2 | {j1['pip_join_s']} | {thru(j1):,.0f} |
| 4 (4N) | 8 | {j4['pip_join_s']} | {thru(j4):,.0f} |

- **executor-scaling efficiency 1→4 executors, median of {len(pairs)}
  pairs — calibration-normalized: {median(norm):.3f}, raw:
  {median(effs):.3f}** (criterion ≥ 0.8: normalized
  {'MET' if median(norm) >= 0.8 else 'NOT MET'}, raw
  {'MET' if median(effs) >= 0.8 else 'NOT MET'}).  Supplements the
  pooled local[N] acceptance statistic with real multi-JVM executors;
  normalized pairs: {', '.join(f'{e:.3f}' for e in norm)}; raw pairs:
  {', '.join(f'{e:.3f}' for e in effs)}.
""" + "".join(
    f"- raw JSON @1exec pair {i+1}: {json.dumps(a)}\n- raw JSON @4exec pair {i+1}: {json.dumps(b)}\n"
    for i, (a, b) in enumerate(pairs)
)
with open("BENCH/BASELINE.md", "a") as f:
    f.write(lines)
print(lines)
EOF
