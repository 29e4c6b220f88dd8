#!/usr/bin/env bash
# Package the engine and run the flagship pipeline via spark-submit
# --py-files (north_rule execution mode). On a real cluster, add
# --master/--deploy-mode/--num-executors; locally it runs on local[*].
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/cuda_gis_smoothing_spark.zip"
(cd "$REPO" && python -c "
import shutil
shutil.make_archive('${ZIP%.zip}', 'zip', '.', 'cuda_gis_smoothing_spark')
")
exec spark-submit --py-files "$ZIP" "$REPO/scripts/pipeline_job.py" "$@"
