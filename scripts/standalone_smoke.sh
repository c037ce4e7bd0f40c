#!/usr/bin/env bash
# Multi-process execution smoke (dev tool; the shipped library does not
# depend on this): stand up a real spark:// standalone master + 2 worker
# JVMs on this box, run graft.Smoke's query subset under BOTH local[*]
# and the standalone master, and diff the canonical SMOKE lines. Also
# drives the reference-compat CLI flagship (-w / -mr / -r) through the
# standalone master. Any local-mode assumption (driver-JVM state,
# non-shared scratch paths, closures that don't serialize, scripts that
# don't ship) shows up as a hash mismatch or a failed stage.
#
# Usage: standalone_smoke.sh [sfDir] [outDir]
set -euo pipefail

SPARK_HOME=${SPARK_HOME:-/opt/spark}
REPO=$(cd "$(dirname "$0")/.." && pwd)
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/graft_smoke}
# ports are env-overridable (ADVICE r11): fixed 7077 made an
# already-running master fail start-master.sh under set -e, and the
# EXIT trap then stopped whatever master OWNED the port
MASTER_PORT=${GRAFT_SMOKE_MASTER_PORT:-7077}
WEBUI_BASE=${GRAFT_SMOKE_WEBUI_BASE:-8089}
MASTER_URL="spark://127.0.0.1:$MASTER_PORT"
# pre-flight: refuse to start over a port someone else owns
if command -v ss >/dev/null 2>&1 && ss -ltn | awk '{print $4}' \
    | grep -q ":$MASTER_PORT\$"; then
  echo "port $MASTER_PORT already bound - set GRAFT_SMOKE_MASTER_PORT" >&2
  exit 1
fi

# pid/log dirs are PER-PORT: with a shared OUT dir and only the port
# overridden, a shared pid dir would make start-master.sh fail on the
# other run's pid file and the EXIT trap would then stop THAT run's
# master — the cross-run kill the port pre-flight alone cannot prevent
RUNDIR="$OUT/run-$MASTER_PORT"
mkdir -p "$RUNDIR"/logs "$RUNDIR"/pids "$OUT"/work
JAR=$(ls "$REPO"/target/scala-2.13/*.jar 2>/dev/null | head -1) \
  || { echo "run 'sbt package' first" >&2; exit 1; }

export SPARK_MASTER_HOST=127.0.0.1
export SPARK_LOG_DIR="$RUNDIR/logs" SPARK_PID_DIR="$RUNDIR/pids"

cleanup() {
  SPARK_IDENT_STRING=w2 "$SPARK_HOME/sbin/stop-worker.sh" || true
  SPARK_IDENT_STRING=w1 "$SPARK_HOME/sbin/stop-worker.sh" || true
  "$SPARK_HOME/sbin/stop-master.sh" || true
}
trap cleanup EXIT

"$SPARK_HOME/sbin/start-master.sh" --port "$MASTER_PORT" \
  --webui-port "$WEBUI_BASE"
# two separate worker JVMs: SPARK_IDENT_STRING keeps their pid files
# apart; each executor JVM then forks from its own worker
SPARK_IDENT_STRING=w1 SPARK_WORKER_DIR="$OUT/work/w1" \
  "$SPARK_HOME/sbin/start-worker.sh" "$MASTER_URL" \
  -c 4 -m 6g --webui-port "$((WEBUI_BASE + 1))"
SPARK_IDENT_STRING=w2 SPARK_WORKER_DIR="$OUT/work/w2" \
  "$SPARK_HOME/sbin/start-worker.sh" "$MASTER_URL" \
  -c 4 -m 6g --webui-port "$((WEBUI_BASE + 2))"
sleep 5

submit() { # submit <master> <outfile> <class> [args...]
  local master=$1 outfile=$2 cls=$3; shift 3
  "$SPARK_HOME/bin/spark-submit" --master "$master" \
    --driver-memory 4g --executor-memory 5g \
    --conf spark.ui.enabled=false \
    --class "$cls" "$JAR" "$@" > "$outfile" 2> "$outfile.err" \
    || { echo "submit $cls on $master failed:" >&2
         tail -30 "$outfile.err" >&2; exit 1; }
}

# GRAFT_SMOKE_KEYS: comma list, or "all" for the full SparkEntry
# surface (195 keys + flagship) — the per-round default stays the
# 30-key representative subset for speed
SMOKE_KEYS=${GRAFT_SMOKE_KEYS:-}
echo "== graft.Smoke under local[8] =="
submit 'local[8]' "$OUT/local.txt" graft.Smoke "$SF" \
  ${SMOKE_KEYS:+"$SMOKE_KEYS"}
echo "== graft.Smoke under $MASTER_URL (2 workers) =="
submit "$MASTER_URL" "$OUT/cluster.txt" graft.Smoke "$SF" \
  ${SMOKE_KEYS:+"$SMOKE_KEYS"}

grep '^SMOKE' "$OUT/local.txt"   > "$OUT/local.smoke"
grep '^SMOKE' "$OUT/cluster.txt" > "$OUT/cluster.smoke"
if diff "$OUT/local.smoke" "$OUT/cluster.smoke"; then
  echo "SMOKE DIFF: identical ($(wc -l < "$OUT/local.smoke") keys)"
else
  echo "SMOKE DIFF: MISMATCH between local and standalone" >&2
  exit 1
fi

echo "== reference-compat CLI (-w / -mr / -r) local-vs-standalone =="
# wordcount mapper/reducer over stdin/stdout — the same external-script
# pair CliSpec drives; the -mr path then exercises rdd.pipe script
# launch on real worker-forked executor JVMs
write_scripts() {
  cat > "$1/wc_map.py" <<'EOF'
import sys
for line in sys.stdin:
    w = line.strip().split(',')[0]
    if w:
        print(f"{w},1")
EOF
  cat > "$1/wc_red.py" <<'EOF'
import sys
cur, n = None, 0
for line in sys.stdin:
    k, v = line.strip().split(',')
    if cur is not None and k != cur:
        print(f"{cur},{n}"); n = 0
    cur = k; n += int(v)
if cur is not None:
    print(f"{cur},{n}")
EOF
}
# data: unpack the flagship input bundled in the jar, keyed per master so
# the two runs never share chunk dirs
# each CLI step passes its argument list as REAL arguments (ADVICE r11:
# the colon-joined-string + IFS=':' split silently corrupted any
# sfDir/outDir containing a colon)
run_cli_step() { # run_cli_step <master> <dir> <flag> [args...]
  local master=$1 dir=$2 flag=$3; shift 2
  "$SPARK_HOME/bin/spark-submit" --master "$master" \
    --driver-memory 2g --executor-memory 3g \
    --conf spark.ui.enabled=false \
    --class graft.compat.ClientCli "$JAR" "$@" \
    > "$dir/cli_${flag#-}.txt" 2> "$dir/cli_${flag#-}.err" \
    || { echo "CLI $* on $master failed:" >&2
         tail -30 "$dir/cli_${flag#-}.err" >&2; exit 1; }
}
run_cli_suite() { # run_cli_suite <master> <dir>
  local master=$1 dir=$2
  rm -rf "$dir"; mkdir -p "$dir"
  unzip -o -q "$JAR" 'reference/data.txt' -d "$dir"
  cp "$dir/reference/data.txt" "$dir/data.txt"
  write_scripts "$dir"
  run_cli_step "$master" "$dir" -w "$dir/data.txt" 3
  run_cli_step "$master" "$dir" -mr "$dir/data.txt" \
    "$dir/wc_map.py" "$dir/wc_red.py" 3
  run_cli_step "$master" "$dir" -r "$dir/data.txt"
  grep -q 'MAP REDUCE TASK COMPLETE' "$dir/cli_mr.txt"
}
run_cli_suite 'local[8]'    "$OUT/cli_local"
run_cli_suite "$MASTER_URL" "$OUT/cli_cluster"
# the merged -r artifact and the -mr merged artifact must be
# byte-identical across masters
diff "$OUT/cli_local/data_part-00000.txt" \
     "$OUT/cli_cluster/data_part-00000.txt"
diff "$OUT/cli_local/data_part-00000.txt_mr" \
     "$OUT/cli_cluster/data_part-00000.txt_mr"
echo "CLI: -w/-mr/-r artifacts byte-identical local vs standalone"

echo "STANDALONE SMOKE: ALL GREEN"
