"""Merge a fresh ensemble_accuracy.json (e.g. a --ks 3,4 extension run)
into the committed artifact, recomputing the per-k aggregate over the
union.  Episode identity = (k, seed): fresh episodes replace stale ones.

Usage:
    python benchmarks/merge_ensemble.py \
        benchmarks/artifacts/ensemble_accuracy.json /tmp/ensemble_k34.json
"""

from __future__ import annotations

import json
import sys

import numpy as np


def merge(base_path: str, new_path: str) -> int:
    with open(base_path) as f:
        base = json.load(f)
    with open(new_path) as f:
        fresh = json.load(f)
    assert base.get("scene") == fresh.get("scene"), (
        base.get("scene"), fresh.get("scene"))
    assert base.get("steps") == fresh.get("steps")

    merged = {(r["k"], r["seed"]): r for r in base["episodes"]}
    for r in fresh["episodes"]:
        merged[(r["k"], r["seed"])] = r
    rows = [merged[k] for k in sorted(merged)]

    agg = []
    for k in sorted({r["k"] for r in rows}):
        sub = [r for r in rows if r["k"] == k]
        for which in ("hybrid_ratio", "screen_ratio"):
            v = np.array([r[which] for r in sub])
            agg.append({
                "k": k, "ratio": which, "n_episodes": len(v),
                "mean": float(v.mean()),
                "std": float(v.std(ddof=1)) if len(v) > 1 else 0.0,
                "min": float(v.min()), "max": float(v.max()),
                "brackets_1": bool(v.min() <= 1.0 <= v.max()),
            })

    out = dict(base)
    out["episodes"] = rows
    out["aggregate"] = agg
    with open(base_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"{base_path}: {len(base['episodes'])} + "
          f"{len(fresh['episodes'])} fresh -> {len(rows)} episodes")
    return 0


if __name__ == "__main__":
    raise SystemExit(merge(sys.argv[1], sys.argv[2]))
