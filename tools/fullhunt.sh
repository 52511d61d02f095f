#!/bin/bash
# Full-corpus refresh, POLL mode (round 16): the siege protocol
# (fullrefresh.sh) burns a full ~8-minute attempt to discover the window
# was degraded; on a host whose pockets are rare that costs 24 wasted
# attempts a round (round-15/16 evidence). This mode spends a ~40 s
# calibration gauge instead and fires the full attempt ONLY when the
# gauge reads quiet — part4hunt.sh's rationing applied to the whole
# corpus. Skips while the builder holds /tmp/graft_busy; stops after
# FULLH_MAX fired attempts or on refresh (BENCH_DETAILS.json stamped by
# the harness's own routing).
#
# Env knobs: FULLH_CP (classes dir), FULLH_THRESH (gauge gate),
# FULLH_MAX (fired-attempt cap), FULLH_LOG.
set -u
cd /root/repo
CP="${FULLH_CP:-/tmp/bench_classes_r17}:/opt/spark/jars/*"
LOG=${FULLH_LOG:-/tmp/fullhunt.log}
THRESH=${FULLH_THRESH:-1.16}
# Text-family gauge gate (round 17): rounds 15-16 measured windows where
# the hash gauge read a mild 1.33x while the explode-heavy family ran
# 3-6.5x — this second gauge (explode/split/groupBy, idle ~0.80 s) must
# ALSO read quiet before an attempt fires.
TEXT_THRESH=${FULLH_TEXT_THRESH:-0.66}
MAX=${FULLH_MAX:-8}
N=0
echo "$(date +%T) full-hunt start (threshold $THRESH, cap $MAX)" >> "$LOG"
while [ "$N" -lt "$MAX" ]; do
  if [ -f /tmp/graft_busy ]; then sleep 60; continue; fi
  CAL=$(SPARK_GRAFT_CALIB_ONLY=1 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        java -cp "$CP" graft.Bench 2>/dev/null | tail -1 | \
        python3 -c 'import sys,json;d=json.load(sys.stdin);print(d["calib"],d.get("calib_text",-1))' 2>/dev/null)
  read -r CALH CALT <<< "${CAL:-}"
  echo "$(date +%T) calib=${CALH:-none} calib_text=${CALT:-none}" >> "$LOG"
  if [ -z "${CALH:-}" ] || [ -z "${CALT:-}" ]; then sleep 150; continue; fi
  OK=$(python3 -c "print(1 if 0 < $CALH <= $THRESH and 0 < $CALT <= $TEXT_THRESH else 0)")
  if [ "$OK" != "1" ]; then sleep 170; continue; fi
  if [ -f /tmp/graft_busy ]; then continue; fi
  N=$((N+1))
  echo "$(date +%T) POCKET (calib=$CALH text=$CALT) -> full attempt $N/$MAX" >> "$LOG"
  if ! SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      java -cp "$CP" graft.Bench > /tmp/fullhunt_attempt.out 2>&1; then
    echo "$(date +%T) attempt $N: bench FAILED" >> "$LOG"; sleep 120; continue
  fi
  SUMMARY=$(tail -1 /tmp/fullhunt_attempt.out)
  if echo "$SUMMARY" | grep -q '"detail":"BENCH_DETAILS.json"'; then
    echo "$(date +%T) attempt $N: REFRESHED — $SUMMARY" >> "$LOG"
    touch /tmp/fullhunt_done
    exit 0
  fi
  echo "$(date +%T) attempt $N: diverted — $SUMMARY" >> "$LOG"
  sleep 90
done
echo "$(date +%T) gave up after $MAX fired attempts" >> "$LOG"
