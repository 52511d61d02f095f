#!/bin/bash
# Scale-sensitive bench signal (round 18, VERDICT item 7).
#
# The sf0.1 fixtures measure pass-count overhead, not data volume: the
# round-17 scaling block showed 8 cores beating 32 on most heavy rows
# because 2 000-row/5 000-row tables are scheduler- and exchange-bound.
# This protocol runs a FIXED, scale-safe heavy-family subset at gsf1
# (6 M lineitem rows / 50 k docs / 20 k vectors — GenScale's seed-42
# deterministic fixtures, regenerated on demand, so the reference stays
# comparable across hosts and rounds) through the SAME graft.Bench
# harness (median-of-3, outlier triage, dual calibration gauges).
#
# Query list rationale (pinned; the artifact records it as
# subset_filter): only queries whose constructions are scale-safe at
# gsf1 qualify —
#   - q102 auto-width REFUSES at 50 k docs by design (its oracle pins
#     the 4-gram choice of the 5 k fixture);
#   - q103/q112/q48/q52's 3-gram fixed width IS the documented
#     saturated regime at 50 k docs over the 31-word vocabulary
#     (round-5: 613 k junk pairs) — they'd measure the cap, not the path;
#   - q107's propagation loudly refuses the 20 k-vector 0.35-cos graph
#     (the round-8 measurement that re-pinned q105 to star contraction).
# What remains: relational/percentile heavy rows over 6 M lineitem
# rows, the linear text-statistics family over 50 k docs, the
# scale-safe 60-bit simhash construction, and the kmeans/semdedup/PQ
# family over 20 k vectors.
#
# Artifact routing: graft.Bench writes SPARK_GRAFT_QUERIES-restricted
# runs to BENCH_DETAILS_SUBSET.json (never the committed sf0.1
# reference). This script copies that artifact to BENCH_GSF1.json (the
# committed gsf reference) ONLY when both in-artifact gauges read quiet
# (the fullhunt gates) — or when BENCH_GSF1.json does not exist yet
# (first run at a new scale establishes the reference, same rule as
# Bench's own detailFileFor; the artifact carries its gauge readings,
# so a later quiet run re-adjudicates honestly).
#
# Usage: tools/gsfbench.sh   (honors /tmp/graft_busy like the hunters)
set -u
cd /root/repo
CP="${GSF_CP:-/root/repo/target/scala-2.13/classes}:/opt/spark/jars/*"
GSF_DIR=${GSF_DIR:-/tmp/gsf1}
OUT=${GSF_OUT:-BENCH_GSF1.json}
THRESH=${GSF_THRESH:-1.20}
TEXT_THRESH=${GSF_TEXT_THRESH:-0.80}
QUERIES="q01,q27,q39,q100,q84,q90,q95,q130,q131,q132,q105,q118,q156,q159,q162,q166,q168,q169"

if [ -f /tmp/graft_busy ]; then
  echo "builder busy (/tmp/graft_busy) — not running" >&2; exit 3
fi
if [ ! -d "$GSF_DIR/lineitem.parquet" ] || [ ! -d "$GSF_DIR/documents.parquet" ] \
   || [ ! -d "$GSF_DIR/embeddings.parquet" ]; then
  echo "generating $GSF_DIR (GenScale 1, deterministic seed-42)" >&2
  java -cp "$CP" graft.GenScale 1 "$GSF_DIR" || exit 1
fi
SPARK_GRAFT_SF_DIR="$GSF_DIR" SPARK_GRAFT_QUERIES="$QUERIES" \
  java -cp "$CP" graft.Bench || exit 1
# Quiet-gauge gate, read from the artifact itself (pre AND post).
VERDICT=$(python3 - "$THRESH" "$TEXT_THRESH" <<'EOF'
import json, sys
t, tt = float(sys.argv[1]), float(sys.argv[2])
d = json.load(open("BENCH_DETAILS_SUBSET.json"))
quiet = all([
    0 < d.get("calib_pre", -1) <= t, 0 < d.get("calib_post", -1) <= t,
    0 < d.get("calib_text_pre", -1) <= tt,
    0 < d.get("calib_text_post", -1) <= tt])
clean = not d.get("polluted", True) and not d.get("errors")
print("quiet" if (quiet and clean) else "degraded")
EOF
)
if [ "$VERDICT" = "quiet" ] || [ ! -f "$OUT" ]; then
  cp BENCH_DETAILS_SUBSET.json "$OUT"
  echo "gsf reference ${OUT} written (window: $VERDICT)" >&2
else
  echo "window degraded — $OUT left as committed" >&2
fi
