#!/usr/bin/env bash
# One-command round reproduction: builds the jar, then runs the three
# driver-facing surfaces in fixed order, emitting the same artifacts the
# driver reads — so local numbers and driver numbers are same-protocol
# by construction.
#
#   scripts/repro.sh [roundTag]          # e.g. scripts/repro.sh r7
#
# Surfaces (in order):
#   1. Verify + type-strict DuckDB oracle at sf0.01 AND sf0.1
#   2. full-surface Bench via real spark-submit at sf0.1
#      -> BENCH/bench_<roundTag>_full.json (complete per-query record;
#         the driver's BENCH_r{N}.json keeps only a 2000-char tail)
#   3. KG pipeline scaling bench (N vs 4N cores, 6M pages)
#      -> BENCH/pipeline.json
#
# Box-noise protocol (BASELINE.md): check the printed load BEFORE
# trusting the scaling number — the 16-core leg absorbs ambient load
# disproportionately; re-run surface 3 in a quiet window if load > 2.
set -euo pipefail
cd "$(dirname "$0")/.."

TAG="${1:-local}"
JAR=target/scala-2.13/named_entity_recognitionspark_2.13-0.1.0.jar

echo "== build =="
sbt -batch package

echo "== surface 1: Verify + oracle (sf0.01, sf0.1) =="
for SF in 0.01 0.1; do
  OUT="/tmp/repro_verify_sf${SF}"
  SPARK_GRAFT_CPUS=16 sbt -batch \
    "runMain graft.Verify /root/testdata/sf${SF} ${OUT}" \
    > "/tmp/repro_verify_sf${SF}.log" 2>&1
  python3 scripts/check_oracle.py "/root/testdata/sf${SF}" "${OUT}" \
    | tail -2
done

echo "== surface 2: full-surface bench (sf0.1, local[32]) =="
uptime
( cd /tmp && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    /opt/spark/bin/spark-submit --master "local[32]" \
    --driver-memory 100g --class graft.Bench "$OLDPWD/$JAR" \
    2>/dev/null | grep '^{' ) > "BENCH/bench_${TAG}_full.json"
python3 - "BENCH/bench_${TAG}_full.json" << 'PY'
import json, sys
d = json.load(open(sys.argv[1]))
bad = [k for k, v in d["queries"].items() if v < 0]
slow = sorted(d["queries"].items(), key=lambda kv: -kv[1])[:5]
total, n = d["value"], len(d["queries"])
print(f"total {total:.1f} s  n {n}  errors {bad}")
print("slowest:", ", ".join(f"{k} {v:.1f}s" for k, v in slow))
PY

echo "== surface 3: pipeline scaling (4 vs 16 cores, 6M pages) =="
uptime
sbt -batch "runMain graft.bench.PipelineBench 6000000 BENCH/pipeline.json 4" \
  > /tmp/repro_pipeline.log 2>&1
python3 - BENCH/pipeline.json << 'PY'
import json, sys
d = json.load(open(sys.argv[1]))
eff, t = d["scaling_efficiency"], d["triples"]
legs = [(k, v["wall_s"]) for k, v in d.items()
        if isinstance(v, dict) and "wall_s" in v]
print(f"scaling_efficiency {eff:.3f}  triples {t}  " +
      "  ".join(f"{k} {w:.1f}s" for k, w in legs))
PY

echo "== done: BENCH/bench_${TAG}_full.json + BENCH/pipeline.json =="
