#!/usr/bin/env bash
# 2-worker standalone cluster bench (VERDICT r11 ask #3): start a REAL
# master + TWO worker JVMs, spark-submit the 20 headline queries, and
# record per-query wall time + shuffle read/write BYTES — the metric
# local[32] cannot see (one JVM's "shuffle" is a memory copy).
# Extends smoke_standalone.sh's deploy path with timing + metrics.
#
# Usage: tools/submit/bench_standalone.sh <round> [sf_dir]
#   writes BENCH_cluster_r{NN}.json at the repo root, gating shuffle
#   bytes against the newest previous BENCH_cluster_r*.json.
set -euo pipefail
cd "$(dirname "$0")/../.."

ROUND="${1:?usage: bench_standalone.sh <round> [sf_dir]}"
SF_DIR="${2:-/root/testdata/sf0.1}"
SPARK_HOME="${SPARK_HOME:-/opt/spark}"
OUT=$(printf 'BENCH_cluster_r%02d.json' "$ROUND")
PREV=$(ls -1 BENCH_cluster_r*.json 2>/dev/null | grep -v "$OUT" | sort | tail -1 || true)
PORT=7077
WEBUI=8089
# NB: do NOT export SPARK_NO_DAEMONIZE (spark-daemon.sh tests
# ${SPARK_NO_DAEMONIZE+set} — even an empty export forces foreground)
unset SPARK_NO_DAEMONIZE || true
export SPARK_LOG_DIR=/tmp/spark-standalone-logs
export SPARK_PID_DIR=/tmp/spark-standalone-pids
export SPARK_WORKER_INSTANCES=2
mkdir -p "$SPARK_LOG_DIR" "$SPARK_PID_DIR"

cleanup() {
  SPARK_WORKER_INSTANCES=2 "$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1 || true
  "$SPARK_HOME/sbin/stop-master.sh" >/dev/null 2>&1 || true
}
trap cleanup EXIT

echo "== packaging =="
tools/submit/build_zip.sh

echo "== starting standalone master + 2 workers =="
"$SPARK_HOME/sbin/start-master.sh" --host 127.0.0.1 --port $PORT --webui-port $WEBUI
# two worker JVMs, bounded: 2 x 8 cores / 12g on the 32-core box
"$SPARK_HOME/sbin/start-worker.sh" "spark://127.0.0.1:$PORT" --cores 8 --memory 12g
sleep 5

echo "== spark-submit cluster bench =="
"$SPARK_HOME/bin/spark-submit" \
  --master "spark://127.0.0.1:$PORT" \
  --py-files dist/mapreducewordoccurences_spark.zip \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.shuffle.partitions=16 \
  --conf spark.executor.cores=4 \
  --conf spark.executor.memory=5g \
  --conf spark.cores.max=16 \
  --conf spark.driver.memory=6g \
  tools/submit/bench_cluster.py \
  --sf-dir "$SF_DIR" --out "$OUT" --n-workers 2 \
  ${PREV:+--prev "$PREV"}

echo "== artifact: $OUT =="
python - "$OUT" <<'PY'
import json, sys
d = json.load(open(sys.argv[1]))
print("total", d["value"], "s |", d["cluster"]["n_executors"], "executors |",
      round(d["total_shuffle_write_bytes"] / 2**20, 1), "MiB shuffled |",
      len(d["shuffle_regressions"]), "shuffle regressions")
PY
