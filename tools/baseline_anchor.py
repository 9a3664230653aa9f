#!/usr/bin/env python
"""Anchor the extrapolated reference baseline with a FULL-schedule run.

``bench.py`` extrapolates the reference's per-frame cost from a 12-iteration
probe (BASELINE_MEASURED.json).  This script runs the reference pyramid
solver through the COMPLETE 600-iteration schedule at reduced resolution
(240×320 — 1/12 the pixels of the benchmark frame, ~7 min instead of ~87),
then scales per pixel·iteration to 720×1280 and records both numbers so the
extrapolation is cross-checked by a real end-to-end run.

Run:  python tools/baseline_anchor.py   → appends to BASELINE_MEASURED.json
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np  # noqa: E402

H, W = 240, 320
ROI = (0, H, 0, W)
N_ITER = 600
FULL_PIXELS = 720 * 1280


def main():
    from event_based_bos_tpu.data.synthetic import (SyntheticBosConfig,
                                                    generate_sequence)
    from reference_harness import make_pyramid_solver

    cfg = SyntheticBosConfig(height=H, width=W, duration=1.0 / 30.0, fps=30.0,
                             events_per_frame=60000, max_displacement=3.0,
                             plume_speed=300.0, seed=0)
    seq = generate_sequence(cfg)
    events, frame = seq["events"], seq["frames"][1]

    solver = make_pyramid_solver(H, W, coarsest=64, n_iter=N_ITER)
    t0 = time.perf_counter()
    solver.calculate_iwe_cache(events)
    iwe_s = time.perf_counter() - t0
    del solver.cache_histogram, solver.cache_weights

    t0 = time.perf_counter()
    solver.estimate(events, frame=frame, background=frame)
    full_s = time.perf_counter() - t0
    total_iters = sum(N_ITER // (4 - i + 1) for i in range(4))

    # per-(pixel·iteration) cost scaled to the 720×1280 benchmark frame
    per_px_iter = (full_s - iwe_s) / (H * W * total_iters)
    anchored_720 = iwe_s * FULL_PIXELS / (H * W) + \
        per_px_iter * FULL_PIXELS * total_iters

    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(path) as f:
        data = json.load(f)
    data["anchor_full_schedule"] = {
        "resolution": f"{H}x{W}", "n_iter": N_ITER,
        "total_iters": total_iters, "wall_s": full_s, "iwe_s": iwe_s,
        "extrapolated_720x1280_s": anchored_720,
        "probe_extrapolation_720x1280_s": data["reference_per_frame_s"],
        "agreement_ratio": anchored_720 / data["reference_per_frame_s"],
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(data["anchor_full_schedule"], indent=1))


if __name__ == "__main__":
    main()
