"""Rebuild aggregate_<scene>.json from a committed protocol row list.

Applies the harness' transport-noise quarantine rule to the raw
per-episode rows (mutating their ``suspect_transport_noise`` flags in
place) and writes per-(k, method, camera) run-variance moments over the
clean rows.  Use after merging fresh rows with merge_protocol.py.

Usage:
    python benchmarks/rebuild_aggregates.py BunnyScene DragonScene
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

ART = os.path.join(os.path.dirname(__file__), "artifacts", "protocol")


def rebuild(name: str) -> None:
    with open(f"{ART}/protocol_{name}.json") as f:
        rows = json.load(f)
    groups: dict = {}
    for r in rows:
        groups.setdefault((r["k"], r["method"], r["camera"]), []).append(r)
    agg = []
    for (k, method, camera), g in sorted(groups.items(), key=str):
        ms_all = [r["mean_ms"] for r in g]
        # n=2: the median contains the outlier -> min is the robust
        # reference; n>=3: median (mirrors harness._flag_transport_noise)
        ref = float(np.min(ms_all)) if len(ms_all) == 2 else float(
            np.median(ms_all))
        for r in g:
            r["suspect_transport_noise"] = bool(
                len(g) >= 2 and ref > 0 and r["mean_ms"] > 3.0 * ref)
        clean = [r["mean_ms"] for r in g
                 if not r["suspect_transport_noise"]]
        ms = clean or ms_all
        # row schema shared with bench/harness._write_aggregates (ADVICE
        # r3): k/particles AND scene/num_particles so either writer's
        # output can be committed and pass tests/test_artifacts.py
        agg.append({
            "scene": name,
            "k": k, "method": method, "camera": camera,
            "particles": g[0]["particles"],
            "num_particles": g[0]["particles"],
            "runs": len(g), "runs_quarantined": len(g) - len(clean),
            "mean_ms_mean": round(float(np.mean(ms)), 3),
            "mean_ms_std": (round(float(np.std(ms, ddof=1)), 3)
                            if len(ms) > 1 else 0.0),
            "mean_ms_min": round(float(np.min(ms)), 3),
            "mean_ms_max": round(float(np.max(ms)), 3),
        })
    with open(f"{ART}/protocol_{name}.json", "w") as f:
        json.dump(rows, f, indent=2)
    with open(f"{ART}/aggregate_{name}.json", "w") as f:
        json.dump(agg, f, indent=2)
    q = sum(a["runs_quarantined"] for a in agg)
    print(f"{name}: {len(agg)} aggregate rows, {q} quarantined episodes")


if __name__ == "__main__":
    for scene in sys.argv[1:] or ["BunnyScene", "DragonScene"]:
        rebuild(scene)
