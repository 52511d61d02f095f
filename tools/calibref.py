#!/usr/bin/env python3
"""Calibrated second-class bench references for queries the committed
quiet-window reference does not cover.

The committed BENCH_DETAILS.json is a quiet-window recording; queries
added after it have no same-window reference until a full refresh lands
(covered subtotal <= 1.05x committed — tools/fullrefresh.sh hunts that).
When the host never leaves its degraded band for a whole round, this
tool banks an EXPLICITLY SECOND-CLASS stamp instead of leaving the new
queries referenceless:

    calibrated_ref(q) = noisy_median(q) / host_multiplier

where host_multiplier = (noisy covered subtotal over the queries the
committed reference DOES cover) / (committed covered subtotal) — i.e.
the same-run, same-binary ratio the round-13 adjudications used. The
output file tags every entry "calibrated": true and records the full
derivation; it is a BAND for outlier triage, not a quiet-window claim,
and it never replaces BENCH_DETAILS.json (the refresh path remains the
only way to bless a first-class reference).

Usage: python3 tools/calibref.py [committed] [noisy] [out]
Defaults: BENCH_DETAILS.json BENCH_DETAILS_NOISY.json
          BENCH_DETAILS_CALIBRATED.json
"""
import json
import statistics
import sys


def median_map(detail):
    return {q: statistics.median(runs) for q, runs in detail["runs"].items()}


def main(argv):
    committed_path = argv[1] if len(argv) > 1 else "BENCH_DETAILS.json"
    noisy_path = argv[2] if len(argv) > 2 else "BENCH_DETAILS_NOISY.json"
    out_path = argv[3] if len(argv) > 3 else "BENCH_DETAILS_CALIBRATED.json"

    committed = json.load(open(committed_path))
    noisy = json.load(open(noisy_path))
    ref = median_map(committed)
    cur = median_map(noisy)

    shared = sorted(set(ref) & set(cur))
    if not shared:
        raise SystemExit("no shared queries between committed and noisy runs")
    ref_cov = sum(ref[q] for q in shared)
    cur_cov = sum(cur[q] for q in shared)
    mult = cur_cov / ref_cov
    if mult < 1.0:
        # A noisy run FASTER than committed is a quiet window in disguise:
        # it should have refreshed the reference, not been calibrated.
        raise SystemExit(
            f"noisy run reads {mult:.3f}x of committed — that is a refresh "
            "candidate, not calibration input; run tools/fullrefresh.sh")

    uncovered = sorted(set(cur) - set(ref))
    out = {
        "calibrated": True,
        "second_class": "band for outlier triage only — NOT a quiet-window "
                        "reference; superseded by any future refresh of "
                        "BENCH_DETAILS.json",
        "host_multiplier": round(mult, 4),
        "derivation": {
            "committed_file": committed_path,
            "noisy_file": noisy_path,
            "shared_queries": len(shared),
            "committed_covered_sec": round(ref_cov, 3),
            "noisy_covered_sec": round(cur_cov, 3),
            "noisy_calib": [noisy.get("calib_pre"), noisy.get("calib_post")],
        },
        "queries": {
            q: {"noisy_median": round(cur[q], 3),
                "calibrated_ref": round(cur[q] / mult, 3)}
            for q in uncovered
        },
    }
    json.dump(out, open(out_path, "w"), indent=1, sort_keys=True)
    print(f"host multiplier {mult:.3f}x over {len(shared)} shared queries; "
          f"calibrated refs for {len(uncovered)} uncovered: "
          f"{', '.join(uncovered)}")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv)
