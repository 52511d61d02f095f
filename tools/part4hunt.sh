#!/bin/bash
# Part pocket hunt, poll mode (round 11): skip while the builder holds
# /tmp/graft_busy (their own sbt/spark work would pollute the window),
# poll the ~40 s calibration gauge, and when it reads deep-quiet fire
# the 1/n-corpus part run immediately. NOTE the measured limitation: a
# pocket shorter than the ~90 s poll+startup lag is lost (18:41 round
# 11: quiet poll, pre-gauge 1.271) — prefer tools/part4siege.sh on a
# host with short pockets; this mode only makes sense when attempts
# must be rationed.
#
# Env knobs: PART4_CP (classes dir), PART4_PART (i/n), PART4_THRESH
# (poll gate; clamped warning above the 1.20 acceptance ceiling).
set -u
cd /root/repo
CP="${PART4_CP:-/tmp/bench_classes_r10}:/opt/spark/jars/*"
LOG=${PART4_LOG:-/tmp/part4hunt.log}
THRESH=${PART4_THRESH:-1.13}
PART=${PART4_PART:-4/4}
PARTFILE="BENCH_DETAILS_PART_${PART/\//_of_}.json"
if python3 -c "exit(0 if $THRESH > 1.20 else 1)"; then
  echo "WARNING: PART4_THRESH=$THRESH exceeds the 1.20 acceptance ceiling —" \
       "fired runs can never bank; clamping to 1.20" >> "$LOG"
  THRESH=1.20
fi
echo "$(date +%T) hunt start (threshold $THRESH, part $PART -> $PARTFILE)" >> "$LOG"
while true; do
  if [ -f /tmp/graft_busy ]; then sleep 45; continue; fi
  CAL=$(SPARK_GRAFT_CALIB_ONLY=1 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        java -cp "$CP" graft.Bench 2>/dev/null | tail -1 | \
        python3 -c 'import sys,json;print(json.load(sys.stdin)["calib"])' 2>/dev/null)
  echo "$(date +%T) calib=$CAL" >> "$LOG"
  if [ -z "${CAL:-}" ]; then sleep 120; continue; fi
  OK=$(python3 -c "print(1 if 0 < $CAL <= $THRESH else 0)")
  if [ "$OK" != "1" ]; then sleep 150; continue; fi
  if [ -f /tmp/graft_busy ]; then continue; fi
  echo "$(date +%T) POCKET (calib=$CAL) -> running part $PART" >> "$LOG"
  # Remove the previous artifact FIRST: a launch failure must read as a
  # refusal, not get judged on a committed already-quiet artifact.
  rm -f "$PARTFILE"
  if ! SPARK_GRAFT_PART="$PART" SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      java -cp "$CP" graft.Bench >> "$LOG" 2>&1; then
    echo "$(date +%T) bench FAILED — see $LOG" >> "$LOG"
    git checkout -q -- "$PARTFILE" 2>/dev/null
    sleep 120; continue
  fi
  VERDICT=$(python3 tools/part_verdict.py "$PARTFILE")
  echo "$(date +%T) part verdict: $VERDICT" >> "$LOG"
  if [ "$VERDICT" = "QUIET" ]; then
    if java -cp "$CP" graft.Bench --merge-parts \
        BENCH_DETAILS_PART_1_of_4.json BENCH_DETAILS_PART_2_of_4.json \
        BENCH_DETAILS_PART_3_of_4.json BENCH_DETAILS_PART_4_of_4.json \
        >> "$LOG" 2>&1; then
      touch "${PART4_DONE:-/tmp/part4_banked}"
      echo "$(date +%T) hunt done" >> "$LOG"
    else
      echo "$(date +%T) part quiet but MERGE REFUSED — inspect $LOG" >> "$LOG"
    fi
    exit 0
  fi
  sleep 90
done
