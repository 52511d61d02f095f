#!/bin/bash
# Part-cycling pocket hunt (round 16): the host's quiet pockets are
# shorter than a full 8-minute corpus window (40+ diverted full attempts
# across rounds 15-16), but a 1/4-corpus part needs only ~2 minutes.
# Poll the ~40 s calibration gauge; on a quiet read, run the NEXT
# un-banked part (each part validates its own book-end gauges via
# part_verdict.py — a pocket that closes mid-part self-rejects). When
# all four parts are banked QUIET on the SAME classes snapshot, merge:
# Bench --merge-parts re-checks every gauge and routes the result
# (refresh vs NOISY divert) itself.
#
# Skips while the builder holds /tmp/graft_busy. Stale banked parts are
# N/A by construction: this script rm's all four part files at start,
# so a merge can only see parts from THIS snapshot.
#
# Env knobs: PC_CP (classes dir), PC_THRESH (poll gate), PC_LOG,
# PC_MAX_FIRES (cap on fired part runs).
set -u
cd /root/repo
CP="${PC_CP:-/tmp/bench_classes_r17}:/opt/spark/jars/*"
LOG=${PC_LOG:-/tmp/partcycle.log}
THRESH=${PC_THRESH:-1.16}
# Text-family gauge gate (round 17) — see fullhunt.sh; both must be quiet.
TEXT_THRESH=${PC_TEXT_THRESH:-0.66}
MAXF=${PC_MAX_FIRES:-16}
rm -f BENCH_DETAILS_PART_{1,2,3,4}_of_4.json /tmp/partcycle_done
FIRES=0
echo "$(date +%T) part-cycle start (threshold $THRESH, max fires $MAXF)" >> "$LOG"
next_part() {
  for i in 1 2 3 4; do
    F="BENCH_DETAILS_PART_${i}_of_4.json"
    if [ ! -f "$F" ] || [ "$(python3 tools/part_verdict.py "$F")" != "QUIET" ]; then
      echo "$i"; return
    fi
  done
  echo ""
}
while [ "$FIRES" -lt "$MAXF" ]; do
  if [ -f /tmp/graft_busy ]; then sleep 60; continue; fi
  P=$(next_part)
  if [ -z "$P" ]; then
    echo "$(date +%T) all four parts QUIET -> merging" >> "$LOG"
    java -cp "$CP" graft.Bench --merge-parts \
      BENCH_DETAILS_PART_1_of_4.json BENCH_DETAILS_PART_2_of_4.json \
      BENCH_DETAILS_PART_3_of_4.json BENCH_DETAILS_PART_4_of_4.json \
      >> "$LOG" 2>&1
    touch /tmp/partcycle_done
    echo "$(date +%T) merge attempted (see routing above)" >> "$LOG"
    exit 0
  fi
  CAL=$(SPARK_GRAFT_CALIB_ONLY=1 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        java -cp "$CP" graft.Bench 2>/dev/null | tail -1 | \
        python3 -c 'import sys,json;d=json.load(sys.stdin);print(d["calib"],d.get("calib_text",-1))' 2>/dev/null)
  read -r CALH CALT <<< "${CAL:-}"
  echo "$(date +%T) calib=${CALH:-none} calib_text=${CALT:-none} next_part=$P fires=$FIRES" >> "$LOG"
  if [ -z "${CALH:-}" ] || [ -z "${CALT:-}" ]; then sleep 150; continue; fi
  OK=$(python3 -c "print(1 if 0 < $CALH <= $THRESH and 0 < $CALT <= $TEXT_THRESH else 0)")
  if [ "$OK" != "1" ]; then sleep 170; continue; fi
  if [ -f /tmp/graft_busy ]; then continue; fi
  FIRES=$((FIRES+1))
  echo "$(date +%T) POCKET (calib=$CALH text=$CALT) -> part $P (fire $FIRES/$MAXF)" >> "$LOG"
  if ! SPARK_GRAFT_PART="$P/4" SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      java -cp "$CP" graft.Bench >> "$LOG" 2>&1; then
    echo "$(date +%T) part $P FAILED" >> "$LOG"; sleep 120; continue
  fi
  V=$(python3 tools/part_verdict.py "BENCH_DETAILS_PART_${P}_of_4.json")
  echo "$(date +%T) part $P verdict: $V" >> "$LOG"
  sleep 30
done
echo "$(date +%T) gave up after $MAXF fired part runs" >> "$LOG"
