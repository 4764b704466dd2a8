#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north_rule packaging).
#
#   ./scripts/build_submit_zip.sh          # → dist/web_crawler_spark.zip
#
# Cluster submission (example; any Spark ≥ 3.5 cluster):
#
#   spark-submit \
#     --master yarn --deploy-mode cluster \
#     --py-files dist/web_crawler_spark.zip \
#     --conf spark.sql.adaptive.enabled=true \
#     --conf spark.sql.shuffle.partitions=2000 \
#     dist/submit_main.py --catalog s3://bucket/crawl --epochs 3
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/web_crawler_spark.zip
zip -qr dist/web_crawler_spark.zip web_crawler_spark -x '*__pycache__*'
cp scripts/submit_main.py dist/submit_main.py
echo "built dist/web_crawler_spark.zip ($(du -h dist/web_crawler_spark.zip | cut -f1))"
python - <<'EOF'
import subprocess, sys, tempfile, os
# smoke: the zip is importable standalone
with tempfile.TemporaryDirectory() as d:
    env = dict(os.environ, PYTHONPATH=os.path.abspath("dist/web_crawler_spark.zip"))
    r = subprocess.run([sys.executable, "-c", "import web_crawler_spark; import web_crawler_spark.cli; print('zip import ok')"],
                       env=env, capture_output=True, text=True, cwd=d)
    print(r.stdout.strip() or r.stderr.strip())
    sys.exit(r.returncode)
EOF
