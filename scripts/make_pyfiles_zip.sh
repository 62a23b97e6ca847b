#!/bin/bash
# Package the engine for spark-submit --py-files (north_rule: "run via
# spark-submit --py-files on a multi-executor cluster").
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f dist/edk_spark.zip
mkdir -p dist
# python stdlib zipfile (no zip binary assumption)
python3 - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/edk_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("earth_data_kit_spark/**/*.py")):
        z.write(p, p.as_posix())
    z.write("__spark_entry__.py")
print("wrote dist/edk_spark.zip")
EOF
