#!/usr/bin/env bash
# Solo scale probes (dev tool): one key per JVM via SPARK_GRAFT_ONLY,
# the BASELINE.md exponent-table protocol. Each run emits the bench's
# one-line JSON (with load/probe contention evidence) to stdout and a
# per-key log under /tmp/solo_<tag>_<key>.log.
#
# Usage: solo_probe.sh <sfDir> <tag> <key> [key ...]
#   SPARK_DRIVER_MEM (default 16g) and SPARK_GRAFT_SHUFFLE_PARTITIONS
#   pass through to the bench harness.
set -u
SF="$1"; TAG="$2"; shift 2
for KEY in "$@"; do
  LOG="/tmp/solo_${TAG}_${KEY}.log"
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$KEY" \
    SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-16g}" \
    sbt -batch "runMain graft.Bench" > "$LOG" 2>&1
  grep -h '"metric"' "$LOG" || echo "{\"key\":\"$KEY\",\"FAILED\":true,\"log\":\"$LOG\"}"
done
