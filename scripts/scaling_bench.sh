#!/usr/bin/env bash
# Scaling-efficiency evidence (BASELINE.json: >=0.8 from N to 4N executors).
# bench.py's built-in probe runs the identical extraction job + input +
# shuffle partitioning at a ladder of CPU-affinity-pinned parallelism
# levels (2 -> 8 -> 32 by default; cores = only variable, min of 5 reps
# per level); this wrapper formats the result into BENCH.md.
# Usage: scaling_bench.sh [file-with-bench-json-line]  (no arg: run bench.py)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="BENCH.md"
if [ $# -ge 1 ]; then
  J=$(grep -o '{"metric".*' "$1" | tail -1)
else
  J=$(python bench.py | tail -1)
fi
python - "$J" <<'PY' >> "$OUT"
import json, sys, datetime
j = json.loads(sys.argv[1])
s = j["extras"]["scaling"]
print(f"\n## Scaling run {datetime.date.today()} (sf={j['sf']}, input x{s['input_replication']})\n")
print(f"methodology: {s['methodology']}\n")
print("| pinned CPUs | triples/sec | runs (sec) |")
print("|---|---|---|")
for cpus, tps in s["triples_per_sec"].items():
    print(f"| {cpus} | {tps:.1f} | {s['runs_sec'][cpus]} |")
print("\n| N -> 4N pair | efficiency | box hw ceiling | efficiency vs ceiling |")
print("|---|---|---|---|")
for pair, p in s["pairs_n_to_4n"].items():
    print(f"| {pair} | {p['efficiency']} | {p['hw_ceiling_efficiency']} | {p['efficiency_vs_hw_ceiling']} |")
print(f"\n**headline efficiency (unsaturated N->4N pair): {s['efficiency']}** (criterion >= 0.8)")
print(f"\nheadline queries (local[{j['cpus']}]): `{json.dumps(j['queries'])}`")
print(f"\nextras: `{json.dumps({k: v for k, v in j['extras'].items() if k != 'scaling'})}`")
PY
echo "wrote $OUT" >&2
