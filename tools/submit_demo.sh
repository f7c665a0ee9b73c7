#!/usr/bin/env bash
# Package the engine as a --py-files zip and run the flagship via
# spark-submit (north-rule deployment shape). Usage:
#   tools/submit_demo.sh [n_images] [cores]
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-100000}"
CORES="${2:-8}"
ZIP=/tmp/metric_search_spark.zip
rm -f "$ZIP"
python - <<EOF
import zipfile, pathlib
z = zipfile.ZipFile("$ZIP", "w", zipfile.ZIP_DEFLATED)
for p in pathlib.Path("metric_search_spark").rglob("*.py"):
    z.write(p, str(p))
z.close()
print("packaged", "$ZIP")
EOF
exec spark-submit \
  --master "local[$CORES]" \
  --driver-memory 16g \
  --conf spark.sql.shuffle.partitions="$CORES" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$ZIP" \
  tools/submit_job.py --images "$N" --k 10
