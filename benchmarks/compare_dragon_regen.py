"""Old-vs-new DragonScene k>=4 comparison (VERDICT r4 missing #2).

Round 4's midpoint-anchor fix exposed that the round-3 dragon k>=4 rows
were measured under a broad phase whose p-anchored expand=3.2 lookup
only covered particles slower than ~120 u/s -- k>=4 spawn columns reach
~196 u/s, so those rows may have MISSED contacts.  After regenerating
the ladder under the fixed (midpoint, expand=3.1) config, this script
quantifies what changed: per (k, method) collision totals and mean_ms,
old (a given git rev) vs new (working tree).

Usage:
    python benchmarks/compare_dragon_regen.py [--rev <git-rev>] [--k-min 4]
"""

from __future__ import annotations

import argparse
import collections
import json
import subprocess

PATH = "benchmarks/artifacts/protocol/protocol_DragonScene.json"


def rows_at(rev: str | None):
    if rev is None:
        with open(PATH) as f:
            return json.load(f)
    out = subprocess.check_output(["git", "show", f"{rev}:{PATH}"])
    return json.loads(out)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rev", default="HEAD")
    ap.add_argument("--k-min", type=int, default=4)
    args = ap.parse_args()

    old = rows_at(args.rev)
    new = rows_at(None)

    def agg(rows):
        g = collections.defaultdict(lambda: ([], []))
        for r in rows:
            if r["k"] >= args.k_min:
                g[(r["k"], r["method"])][0].append(r["collisions"])
                g[(r["k"], r["method"])][1].append(r["mean_ms"])
        return g

    go, gn = agg(old), agg(new)
    print(f"{'k':>2} {'method':<14} {'old collisions':>16} {'new collisions':>16} "
          f"{'ratio':>7} {'old ms':>8} {'new ms':>8}")
    for key in sorted(set(go) | set(gn)):
        k, m = key
        oc = sum(go[key][0]) / max(1, len(go[key][0])) if key in go else None
        nc = sum(gn[key][0]) / max(1, len(gn[key][0])) if key in gn else None
        om = (sum(go[key][1]) / len(go[key][1])) if key in go else None
        nm = (sum(gn[key][1]) / len(gn[key][1])) if key in gn else None
        ratio = (nc / oc) if (oc and nc) else float("nan")
        print(f"{k:>2} {m:<14} "
              f"{oc if oc is not None else '-':>16} "
              f"{nc if nc is not None else '-':>16} "
              f"{ratio:>7.3f} "
              f"{om if om is not None else float('nan'):>8.2f} "
              f"{nm if nm is not None else float('nan'):>8.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
