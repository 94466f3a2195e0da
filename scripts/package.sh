#!/usr/bin/env bash
# Build the spark-submit artifact: a zip of the argo_spark package for
# --py-files distribution to executors (north_rule launch mode).
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f dist/argo_spark.zip
mkdir -p dist
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path("argo_spark")
with zipfile.ZipFile("dist/argo_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.rglob("*.py")):
        z.write(p, p.as_posix())
print("wrote dist/argo_spark.zip")
EOF
echo "submit with:"
echo "  spark-submit --py-files dist/argo_spark.zip jobs/run_pipeline.py <pages_path> <out_dir>"
