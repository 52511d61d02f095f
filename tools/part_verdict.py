#!/usr/bin/env python3
"""Shared acceptance verdict for a split-window bench part artifact.

Usage: python3 tools/part_verdict.py <part-file>

Prints "QUIET" when the artifact passes every rule `Bench --merge-parts`
enforces (not polluted, both calib gauges in (0, 1.20], no errors, every
outlier resolved), else a semicolon-joined list of violations. One
definition for both hunters (poll-mode part4hunt.sh, siege-mode
part4siege.sh) so the acceptance rules cannot drift apart.
"""
import json
import sys

QUIET_CALIB = 1.20  # Bench.QuietCalib
QUIET_CALIB_TEXT = 0.66  # Bench.QuietCalibText (round 17: explode-family gauge)
OUTLIER_FACTOR = 2.0  # Bench.OutlierFactor


def verdict(path):
    try:
        d = json.load(open(path))
    except Exception as e:  # noqa: BLE001 - any read/parse failure is a refusal
        return f"unreadable:{e}"
    bad = []
    if d.get("polluted"):
        bad.append("polluted")
    for g in ("calib_pre", "calib_post"):
        v = d.get(g, -1)
        if not (0 < v <= QUIET_CALIB):
            bad.append(f"{g}={v}")
    # A part with NO text readings (pre-gauge binary) is from a window of
    # unknown text-family health — not quiet (matches Bench --merge-parts).
    for g in ("calib_text_pre", "calib_text_post"):
        v = d.get(g, -1)
        if not (0 < v <= QUIET_CALIB_TEXT):
            bad.append(f"{g}={v}")
    if d.get("errors"):
        bad.append("errors")
    for q, o in (d.get("outliers") or {}).items():
        rr = o.get("rerun")
        if rr is None or not (o.get("ref", 0) > 0 and rr <= OUTLIER_FACTOR * o["ref"]):
            bad.append(f"unresolved:{q}")
    return "QUIET" if not bad else ";".join(bad)


if __name__ == "__main__":
    print(verdict(sys.argv[1]))
