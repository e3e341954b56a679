#!/usr/bin/env bash
# Package ttmf_spark and launch via spark-submit --py-files (the
# north-rule cluster launch path). Extra spark-submit conf goes in
# $SPARK_SUBMIT_OPTS_EXTRA; master defaults to local[8] for dev boxes
# and should be the cluster master URL in production.
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="${TMPDIR:-/tmp}/ttmf_spark_pkg.zip"
rm -f "$ZIP"
(cd "$ROOT" && python -c "
import zipfile, pathlib
with zipfile.ZipFile('$ZIP', 'w', zipfile.ZIP_DEFLATED) as z:
    for p in sorted(pathlib.Path('ttmf_spark').rglob('*.py')):
        z.write(p, p.as_posix())
")
exec spark-submit \
  --master "${SPARK_MASTER:-local[8]}" \
  ${SPARK_SUBMIT_OPTS_EXTRA:-} \
  --py-files "$ZIP" \
  "$ROOT/scripts/submit_main.py" "$@"
