#!/usr/bin/env bash
# Run the bench (or any engine script) via spark-submit --py-files, the way
# the engine ships to a real cluster (north_star: "runs via spark-submit
# --py-files at N and 4N executors"). Locally this uses local[$CPUS]; on a
# cluster replace --master and add executor confs.
#
# Usage: tools/submit.sh [script=bench.py] [args...]
#   env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_SF_DIR
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CPUS="${SPARK_GRAFT_CPUS:-32}"
SCRIPT="${1:-$REPO/bench.py}"
shift || true

ZIP="$(mktemp -d)/mini_search_engine_spark.zip"
(cd "$REPO" && python -c "
import shutil, sys
shutil.make_archive(sys.argv[1][:-4], 'zip', '.', 'mini_search_engine_spark')
" "$ZIP")

SPARK_SUBMIT="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"
exec "$SPARK_SUBMIT" \
  --master "local[$CPUS]" \
  --conf spark.sql.shuffle.partitions="$CPUS" \
  --py-files "$ZIP" \
  "$SCRIPT" "$@"
