#!/bin/bash
# Part-4/4 pocket hunt (split-window bench protocol, BASELINE.md round-10
# close). Loops: skip while the builder holds /tmp/graft_busy (their own
# sbt/spark work would pollute the window), poll the ~40 s calibration
# gauge, and when it reads deep-quiet fire the 1/4-corpus part run
# immediately. A landed part is evaluated by the same gauge rules
# mergeParts enforces; on success, attempt the merge and stop.
set -u
cd /root/repo
CP="/tmp/bench_classes_r10:/opt/spark/jars/*"
LOG=/tmp/part4hunt.log
THRESH=${PART4_THRESH:-1.13}
PART=${PART4_PART:-4/4}
PARTFILE="BENCH_DETAILS_PART_${PART/\//_of_}.json"
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
  SPARK_GRAFT_PART="$PART" SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    java -cp "$CP" graft.Bench >> "$LOG" 2>&1
  VERDICT=$(python3 - "$PARTFILE" <<'EOF'
import json,sys
try: d=json.load(open(sys.argv[1]))
except Exception as e: print(f"unreadable:{e}"); sys.exit(0)
bad=[]
if d.get("polluted"): bad.append("polluted")
for g in ("calib_pre","calib_post"):
    v=d.get(g,-1)
    if not (0 < v <= 1.20): bad.append(f"{g}={v}")
if d.get("errors"): bad.append("errors")
for q,o in (d.get("outliers") or {}).items():
    rr=o.get("rerun")
    if rr is None or not (o.get("ref",0)>0 and rr<=2.0*o["ref"]): bad.append(f"unresolved:{q}")
print("QUIET" if not bad else ";".join(bad))
EOF
)
  echo "$(date +%T) part verdict: $VERDICT" >> "$LOG"
  if [ "$VERDICT" = "QUIET" ]; then
    echo "$(date +%T) part $PART banked quiet — attempting merge" >> "$LOG"
    java -cp "$CP" graft.Bench --merge-parts \
      BENCH_DETAILS_PART_1_of_4.json BENCH_DETAILS_PART_2_of_4.json \
      BENCH_DETAILS_PART_3_of_4.json BENCH_DETAILS_PART_4_of_4.json \
      >> "$LOG" 2>&1
    touch /tmp/part4_banked
    echo "$(date +%T) hunt done" >> "$LOG"
    exit 0
  fi
  sleep 90
done
