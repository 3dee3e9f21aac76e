#!/usr/bin/env bash
# Build the --py-files zip for spark-submit (north rule packaging).
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f dist/json_schemer_spark.zip
mkdir -p dist
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/json_schemer_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("json_schemer_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/json_schemer_spark.zip")
EOF
