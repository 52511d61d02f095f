#!/bin/bash
# Part SIEGE (round 11): the poll-then-fire hunt loses every pocket
# shorter than its own ~90 s detection+startup lag (measured 18:41 — the
# poll read quiet, the part's pre-gauge 90 s later read 1.271). Siege
# mode removes detection latency entirely: run part attempts
# back-to-back, letting each attempt's own calib_pre/calib_post be the
# poll — any pocket at least one attempt long that aligns with an
# attempt gets banked, and a refused attempt costs only itself. Pauses
# while the builder holds /tmp/graft_busy.
#
# Env knobs: PART4_CP (classes dir; freeze a snapshot when banked parts
# predate corpus growth), PART4_PART (i/n), PART4_LOG, PART4_DONE.
set -u
cd /root/repo
CP="${PART4_CP:-/tmp/bench_classes_r10}:/opt/spark/jars/*"
LOG=${PART4_LOG:-/tmp/part4siege.log}
PART=${PART4_PART:-4/4}
PARTFILE="BENCH_DETAILS_PART_${PART/\//_of_}.json"
echo "$(date +%T) siege start (part $PART -> $PARTFILE)" >> "$LOG"
N=0
while true; do
  while [ -f /tmp/graft_busy ]; do sleep 30; done
  N=$((N+1))
  # Remove the previous artifact FIRST: a launch failure (missing
  # snapshot, bad classpath) must read as a refusal, not get judged on
  # a committed already-quiet artifact and falsely bank.
  rm -f "$PARTFILE"
  if ! SPARK_GRAFT_PART="$PART" SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      java -cp "$CP" graft.Bench > /tmp/part_attempt.out 2>&1; then
    echo "$(date +%T) attempt $N: bench FAILED (exit $?) — see /tmp/part_attempt.out" >> "$LOG"
    git checkout -q -- "$PARTFILE" 2>/dev/null
    sleep 60; continue
  fi
  VERDICT=$(python3 tools/part_verdict.py "$PARTFILE")
  echo "$(date +%T) attempt $N: $VERDICT" >> "$LOG"
  if [ "$VERDICT" = "QUIET" ]; then
    if java -cp "$CP" graft.Bench --merge-parts \
        BENCH_DETAILS_PART_1_of_4.json BENCH_DETAILS_PART_2_of_4.json \
        BENCH_DETAILS_PART_3_of_4.json BENCH_DETAILS_PART_4_of_4.json \
        >> "$LOG" 2>&1; then
      touch "${PART4_DONE:-/tmp/part4_banked}"
      echo "$(date +%T) BANKED after $N attempts" >> "$LOG"
    else
      echo "$(date +%T) part quiet but MERGE REFUSED — inspect $LOG" >> "$LOG"
    fi
    exit 0
  fi
  sleep 5
done
