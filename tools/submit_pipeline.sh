#!/usr/bin/env bash
# Launch the KG pipeline via spark-submit --py-files (north_rule launch mode).
#
# Usage: tools/submit_pipeline.sh --input <spans.parquet> --out <dir>
#        [--cpus N] [--force]
#
# Packages recrun_spark into a zip (the unit a real cluster ships to
# executors) and submits recrun_spark/pipeline.py.  On a cluster, replace
# --master with your cluster manager; everything else is identical.
set -euo pipefail

REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
CPUS="${SPARK_GRAFT_CPUS:-32}"
ZIP="$(mktemp -d)/recrun_spark.zip"

(cd "$REPO" && python3 - "$ZIP" <<'PY'
import os, sys, zipfile
zip_path = sys.argv[1]
with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("recrun_spark"):
        if "__pycache__" in root:
            continue
        for fn in files:
            if fn.endswith(".py"):
                p = os.path.join(root, fn)
                z.write(p, p)
print(f"packaged {zip_path}")
PY
)

exec /opt/spark/bin/spark-submit \
  --master "local[${CPUS}]" \
  --driver-memory "${SPARK_GRAFT_DRIVER_MEM:-48g}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.shuffle.partitions=$((2 * CPUS)) \
  --py-files "$ZIP" \
  "$REPO/tools/run_pipeline.py" "$@"
