#!/usr/bin/env bash
# Scaling-efficiency evidence (BASELINE.json: >=0.8 from N to 4N executors).
# bench.py's built-in probe runs the identical extraction job + input +
# shuffle partitioning at local[8] and local[32] (cores = only variable);
# this wrapper formats the result into BENCH.md.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="BENCH.md"
J=$(python bench.py | tail -1)
python - "$J" <<'PY' >> "$OUT"
import json, sys, datetime
j = json.loads(sys.argv[1])
s = j["extras"]["scaling"]
lo = [v for k, v in s.items() if k.startswith("triples_per_sec_local") and k.endswith("8")][0]
keys = [k for k in s if k.startswith("triples_per_sec_local")]
print(f"\n## Scaling run {datetime.date.today()} (sf={j['sf']}, input x{s['input_replication']})\n")
print("| metric | value |")
print("|---|---|")
for k in keys:
    print(f"| {k} | {s[k]:.1f} |")
print(f"| cores ratio | {s['cores_ratio']} |")
print(f"| **efficiency** | **{s['efficiency']}** |")
print(f"\nheadline queries (local[{j['cpus']}]): `{json.dumps(j['queries'])}`")
print(f"\nextras: `{json.dumps({k: v for k, v in j['extras'].items() if k != 'scaling'})}`")
PY
echo "wrote $OUT" >&2
