#!/bin/sh
# Package the engine for spark-submit --py-files (north_rule deployment
# path).  Usage: scripts/make_pyfiles_zip.sh [outdir]
set -e
OUT="${1:-dist}"
mkdir -p "$OUT"
rm -f "$OUT/claimskg_generator_spark.zip"
python - <<'EOF'
import os, zipfile
out = os.environ.get("OUT", "dist")
with zipfile.ZipFile(f"{out}/claimskg_generator_spark.zip", "w",
                     zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("claimskg_generator_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print(f"wrote {out}/claimskg_generator_spark.zip")
EOF
echo "submit with:"
echo "  spark-submit --py-files $OUT/claimskg_generator_spark.zip \\"
echo "      --master <cluster> cli_main.py --input ... --output ..."
