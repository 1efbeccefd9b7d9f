#!/bin/sh
# Package the library for spark-submit --py-files (north-star run mode:
# "runs via spark-submit --py-files on multi-executor clusters").
#
#   sh scripts/make_dist.sh
#   spark-submit --py-files dist/t_digest_spark.zip your_job.py
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/t_digest_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/t_digest_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("t_digest_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/t_digest_spark.zip")
EOF
unzip -l dist/t_digest_spark.zip | tail -3
