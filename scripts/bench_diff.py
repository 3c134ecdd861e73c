"""Compare two BENCH_MATRIX.json files and flag regressions.

Usage: python scripts/bench_diff.py OLD.json [NEW.json] [--tol 0.10]

Prints one line per config whose primary rate metric moved by more than
``tol`` (relative), plus appeared/disappeared configs.  Exit code 1 when
any regression exceeds the tolerance — wire into CI or eyeball between
rounds (BENCH_r{N}.json are the driver's per-round records).
"""

from __future__ import annotations

import argparse
import json
import sys

# preferred rate metric per config, in lookup order (higher = better)
_RATE_KEYS = (
    "gpts_per_s",
    "mpts_per_s",
    "trajectories_per_s",
    "configs_per_hour_per_chip",
    "sustained_configs_per_hour_per_chip",
    "mpts_per_s_32core",
)


def _rate(row):
    for k in _RATE_KEYS:
        v = row.get(k)
        if isinstance(v, (int, float)) and v:
            return k, float(v)
    return None, None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new", nargs="?", default="BENCH_MATRIX.json")
    ap.add_argument("--tol", type=float, default=0.10)
    ns = ap.parse_args(argv)

    with open(ns.old) as f:
        old = json.load(f)
    with open(ns.new) as f:
        new = json.load(f)

    worst = 0.0
    for cfg in sorted(set(old) | set(new)):
        if cfg not in new:
            print(f"{cfg}: GONE (was present in {ns.old})")
            continue
        if cfg not in old:
            print(f"{cfg}: new config")
            continue
        k_old, v_old = _rate(old[cfg])
        k_new, v_new = _rate(new[cfg])
        if v_old is None or v_new is None or k_old != k_new:
            continue
        rel = (v_new - v_old) / v_old
        if abs(rel) >= ns.tol:
            arrow = "REGRESSION" if rel < 0 else "improvement"
            print(f"{cfg}: {k_old} {v_old:g} -> {v_new:g} "
                  f"({rel:+.1%}, {arrow})")
        if rel < 0:
            worst = min(worst, rel)
    return 1 if worst <= -ns.tol else 0


if __name__ == "__main__":
    sys.exit(main())
