#!/bin/sh
# Build the --py-files archive for spark-submit (north rule: the job ships
# as a zip of the package; the driver script stays outside it).
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/taro_spark.zip
python - <<'PY'
import os, zipfile
with zipfile.ZipFile("dist/taro_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("trace_aware_reservoir_otel_spark"):
        if "__pycache__" in root:
            continue
        for fn in files:
            if fn.endswith(".py"):
                p = os.path.join(root, fn)
                z.write(p, p)
print("dist/taro_spark.zip written")
PY
cat <<'USAGE'
Run the flagship at two cluster sizes (the N vs 4N scaling gate):
  spark-submit --master local[8]  --py-files dist/taro_spark.zip jobs/run_flagship.py --input IN --out OUT8
  spark-submit --master local[32] --py-files dist/taro_spark.zip jobs/run_flagship.py --input IN --out OUT32
On a real cluster replace --master with --num-executors N / 4N.
USAGE
