#!/usr/bin/env bash
# Scaling-efficiency evidence (BASELINE.json: >=0.8 from N to 4N executors).
# Runs the identical bench job at local[8] and local[32] on the same input
# and appends the long-form report to BENCH.md.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
OUT="BENCH.md"

run() {
  local cpus="$1"
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$cpus" SPARK_GRAFT_SCALING=0 \
    python bench.py | tail -1
}

echo "running local[8]..." >&2
J8=$(run 8)
echo "running local[32]..." >&2
J32=$(run 32)

python - "$J8" "$J32" <<'PY' >> "$OUT"
import json, sys, datetime
j8, j32 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
t8 = j8["extras"]["extract_triples_per_sec"]; t32 = j32["extras"]["extract_triples_per_sec"]
s8 = j8["extras"]["scored_triples_per_sec"]; s32 = j32["extras"]["scored_triples_per_sec"]
eff_e = (t32 / t8) / 4; eff_s = (s32 / s8) / 4
print(f"\n## Scaling run {datetime.date.today()} (sf={j8['sf']})\n")
print("| stage | local[8] triples/s | local[32] triples/s | efficiency (x4 cores) |")
print("|---|---|---|---|")
print(f"| extract->canonicalize->materialize | {t8:.1f} | {t32:.1f} | {eff_e:.3f} |")
print(f"| + TTMF score (subset) | {s8:.1f} | {s32:.1f} | {eff_s:.3f} |")
print(f"\nraw local[8]: `{json.dumps(j8)}`\n\nraw local[32]: `{json.dumps(j32)}`")
PY
echo "wrote $OUT" >&2
