"""Merge freshly-measured protocol rows into a committed artifact.

run_reference_protocol.py writes protocol_<scene>.json containing only
the rows of THAT sweep; extending a committed ladder (e.g. adding
DragonScene k=6..7 to the committed k=0..5) means merging row lists.
Identity = (k, method, camera, run): fresh rows replace stale ones,
everything else is kept, output sorted by (k, method, camera, run).

Usage:
    python benchmarks/merge_protocol.py \
        benchmarks/artifacts/protocol/protocol_DragonScene.json \
        /tmp/dragon_k67/protocol_DragonScene.json
"""

from __future__ import annotations

import json
import sys


def merge(base_path: str, new_path: str) -> int:
    with open(base_path) as f:
        base = json.load(f)
    with open(new_path) as f:
        fresh = json.load(f)

    # rows from before the run field existed: enumerate duplicates in
    # file order so they do not collapse to a single (..., run=0) key.
    # Applied to BOTH files -- a fresh old-format sweep would otherwise
    # silently drop its own duplicates (ADVICE r3)
    import collections
    for rows in (base, fresh):
        seen = collections.Counter()
        for r in rows:
            if "run" not in r:
                k = (r["k"], r["method"], r["camera"])
                r["run"] = seen[k]
                seen[k] += 1

    def key(r):
        return (r["k"], r["method"], r["camera"], r.get("run", 0))

    merged = {key(r): r for r in base}
    replaced = sum(1 for r in fresh if key(r) in merged)
    for r in fresh:
        merged[key(r)] = r
    rows = [merged[k] for k in sorted(merged)]
    with open(base_path, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"{base_path}: {len(base)} + {len(fresh)} fresh "
          f"({replaced} replaced) -> {len(rows)} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(merge(sys.argv[1], sys.argv[2]))
