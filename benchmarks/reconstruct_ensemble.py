"""Rebuild ensemble_accuracy.json from a (possibly truncated) study log.

study_accuracy_ensemble.py prints each episode row as a JSON line and
writes the artifact only at the end; a deadline-killed run loses the
file but not the rows.  This reassembles the artifact (rows + per-k
aggregate, same schema) from whatever rows the log holds.

Usage:
    python benchmarks/reconstruct_ensemble.py /tmp/ensemble.log \
        benchmarks/artifacts/ensemble_accuracy.json --scene BunnyScene
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def aggregate(rows):
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
    return agg


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("out")
    ap.add_argument("--scene", default="BunnyScene")
    ap.add_argument("--camera", type=int, default=0)
    ap.add_argument("--steps", type=int, default=2001)
    args = ap.parse_args()

    rows = []
    with open(args.log) as f:
        for line in f:
            line = line.strip()
            if not (line.startswith("{") and '"seed"' in line):
                continue
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if {"k", "seed", "hybrid_ratio"} <= set(r):
                rows.append(r)
    with open(args.out, "w") as f:
        json.dump({"episodes": rows, "aggregate": aggregate(rows),
                   "scene": args.scene, "camera": args.camera,
                   "steps": args.steps}, f, indent=2)
    print(f"{args.out}: {len(rows)} episodes, "
          f"ks={sorted({r['k'] for r in rows})}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
