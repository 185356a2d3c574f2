"""Merge a fresh summary_<scene>.json into the committed artifact.

Companion to merge_protocol.py for the harness' summary schema
(bench/harness._write_summary).  Identity = (method, camera,
num_particles, run): fresh rows replace stale ones; output sorted.

Usage:
    python benchmarks/merge_summary.py \
        benchmarks/artifacts/protocol/summary_DragonScene.json \
        /tmp/r5_dragon/summary_DragonScene.json
"""

from __future__ import annotations

import collections
import json
import sys


def merge(base_path: str, new_path: str) -> int:
    with open(base_path) as f:
        base = json.load(f)
    with open(new_path) as f:
        fresh = json.load(f)

    # pre-run-field rows: enumerate duplicates in file order (same
    # back-compat rule as merge_protocol.py)
    for rows in (base, fresh):
        seen = collections.Counter()
        for r in rows:
            if "run" not in r:
                k = (r["method"], r["camera"], r["num_particles"])
                r["run"] = seen[k]
                seen[k] += 1

    def key(r):
        return (r["method"], r["camera"], r["num_particles"],
                r.get("run", 0))

    merged = {key(r): r for r in base}
    replaced = sum(1 for r in fresh if key(r) in merged)
    for r in fresh:
        merged[key(r)] = r
    rows = [merged[k] for k in sorted(merged, key=str)]
    with open(base_path, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"{base_path}: {len(base)} + {len(fresh)} fresh "
          f"({replaced} replaced) -> {len(rows)} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(merge(sys.argv[1], sys.argv[2]))
