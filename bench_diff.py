"""Compare two bench detail records and flag per-query regressions.

Usage::

    python bench_diff.py OLD.json NEW.json [--threshold 0.25] [--floor 0.5]

Reads the ``BENCH_DETAIL.json`` format bench.py writes ({"queries":
{name: sec, ...}, ...}), prints shared-prefix totals and every query
slower by more than ``threshold`` (relative) AND ``floor`` seconds
(absolute — sub-second entries swing with host load and are noise at
any ratio; the r6 drift postmortem in bench.py is the calibration).
Exit code 1 when regressions are found, so CI can gate on it.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.25)
    ap.add_argument("--floor", type=float, default=0.5)
    args = ap.parse_args()

    with open(args.old) as fh:
        old = json.load(fh)["queries"]
    with open(args.new) as fh:
        new = json.load(fh)["queries"]

    shared = [k for k in old if k in new]
    old_total = sum(old[k] for k in shared)
    new_total = sum(new[k] for k in shared)
    print(
        f"shared {len(shared)} queries: {old_total:.1f}s -> {new_total:.1f}s "
        f"({(new_total / old_total - 1) * 100:+.1f}%)"
    )
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new-only ({len(only_new)}): "
              + ", ".join(f"{k}={new[k]:.2f}s" for k in only_new))

    regressions = []
    for k in shared:
        delta = new[k] - old[k]
        if delta > args.floor and new[k] > old[k] * (1 + args.threshold):
            regressions.append((delta, k))
    for delta, k in sorted(regressions, reverse=True):
        print(
            f"REGRESSION {k}: {old[k]:.2f}s -> {new[k]:.2f}s (+{delta:.2f}s)"
        )
    if not regressions:
        print("no regressions above threshold")
    # uniform drift across unrelated plans is a host-load signal, not a
    # code regression — call it out instead of crying wolf
    if len(regressions) >= max(5, len(shared) // 3):
        print(
            "NOTE: broad same-direction drift across unrelated queries — "
            "check host load before blaming the code (see bench.py's r6 "
            "postmortem)"
        )
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
