#!/usr/bin/env bash
# Package the engine and run the partitioned job via spark-submit
# (north-rule invocation: spark-submit --py-files on a cluster; local
# master here, multi-executor on a real deployment).
#
#   scripts/submit.sh [--input DIR] [--output DIR] [--rep N] [--master local[N]] ...
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="${TMPDIR:-/tmp}/sagan_spark.zip"
(cd "$REPO" && python - "$ZIP" <<'EOF'
import os, sys, zipfile
zf = zipfile.ZipFile(sys.argv[1], "w", zipfile.ZIP_DEFLATED)
for root, _dirs, files in os.walk("sagan_spark"):
    if "__pycache__" in root:
        continue
    for f in files:
        p = os.path.join(root, f)
        zf.write(p, p)
zf.close()
print("packaged", sys.argv[1])
EOF
)
exec spark-submit \
  --py-files "$ZIP" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.ui.showConsoleProgress=false \
  "$REPO/sagan_spark/runner/job.py" "$@"
