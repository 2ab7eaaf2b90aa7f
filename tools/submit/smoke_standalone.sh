#!/usr/bin/env bash
# End-to-end cluster-deploy smoke (VERDICT r9 ask #7): start a REAL
# standalone master + worker (separate JVMs, real RPC, real executor
# launch — not local[N]), package the engine, spark-submit the
# wordcount + one dedup row through --py-files, and diff the digest
# against a local[32] run of the same queries. Leaves nothing running.
#
# Usage: tools/submit/smoke_standalone.sh [sf_dir]   (default sf0.001)
set -euo pipefail
cd "$(dirname "$0")/../.."

SPARK_HOME="${SPARK_HOME:-/opt/spark}"
SF_DIR="${1:-/root/testdata/sf0.001}"
QUERIES="wordcount,dedup_exact"
PORT=7077
WEBUI=8089
# NB: do NOT export SPARK_NO_DAEMONIZE (spark-daemon.sh tests
# ${SPARK_NO_DAEMONIZE+set} — even an empty export forces foreground)
unset SPARK_NO_DAEMONIZE || true
export SPARK_LOG_DIR=/tmp/spark-standalone-logs
export SPARK_PID_DIR=/tmp/spark-standalone-pids
mkdir -p "$SPARK_LOG_DIR" "$SPARK_PID_DIR"

cleanup() {
  "$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1 || true
  "$SPARK_HOME/sbin/stop-master.sh" >/dev/null 2>&1 || true
}
trap cleanup EXIT

echo "== packaging =="
tools/submit/build_zip.sh

echo "== starting standalone master + worker =="
"$SPARK_HOME/sbin/start-master.sh" --host 127.0.0.1 --port $PORT --webui-port $WEBUI
# one worker, bounded so the smoke never fights a co-tenant bench
"$SPARK_HOME/sbin/start-worker.sh" "spark://127.0.0.1:$PORT" --cores 8 --memory 8g
sleep 5

echo "== spark-submit (cluster path) =="
"$SPARK_HOME/bin/spark-submit" \
  --master "spark://127.0.0.1:$PORT" \
  --py-files dist/mapreducewordoccurences_spark.zip \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.shuffle.partitions=16 \
  --conf spark.executor.cores=4 \
  --conf spark.executor.memory=3g \
  --conf spark.cores.max=8 \
  tools/submit/submit_job.py \
  --sf-dir "$SF_DIR" --queries "$QUERIES" --out /tmp/submit_digest_cluster.json

echo "== local[32] reference run of the same queries =="
python tools/submit/submit_job_local.py \
  --sf-dir "$SF_DIR" --queries "$QUERIES" --out /tmp/submit_digest_local.json

echo "== digest diff =="
python - <<'PY'
import json, sys
c = json.load(open("/tmp/submit_digest_cluster.json"))["results"]
l = json.load(open("/tmp/submit_digest_local.json"))["results"]
bad = []
for name in c:
    if (c[name]["rows"], c[name]["value_md5"]) != (l[name]["rows"], l[name]["value_md5"]):
        bad.append((name, c[name], l[name]))
if bad:
    print("DIGEST MISMATCH:", bad); sys.exit(1)
print("CLUSTER == LOCAL for", ", ".join(sorted(c)),
      "| rows:", {k: v["rows"] for k, v in c.items()})
PY
echo "== smoke green =="
