#!/usr/bin/env python
"""Definitive baseline: reference solver, FULL schedule, FULL resolution.

Runs the reference PatchEkltPyramid2 once end-to-end on the exact bench
workload (720×1280, ROI rows 0..720 / cols 320..960, ~0.5 M events, 600
iterations over the 64→8 pyramid) and records the measured wall clock as
``reference_per_frame_s`` in BASELINE_MEASURED.json, demoting the probe
extrapolation to a footnote.  The 240×320 full-schedule anchor
(tools/baseline_anchor.py) showed the 12-iteration probe extrapolation
overestimates ~6× (per-scale setup amortizes over the full run), so the
headline vs_baseline must come from this run.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np  # noqa: E402

H, W = 720, 1280
ROI = (0, 720, 320, 960)
N_ITER = 600


def main():
    import bench
    from reference_harness import make_pyramid_solver

    events, frame, _gt = bench.make_workload()

    solver = make_pyramid_solver(H, W, coarsest=64, n_iter=N_ITER)
    solver.crop_xmin, solver.crop_xmax = ROI[0], ROI[1]
    solver.crop_ymin, solver.crop_ymax = ROI[2], ROI[3]
    mask = np.zeros((H, W))
    mask[ROI[0]:ROI[1], ROI[2]:ROI[3]] = 1
    solver.estimate_mask_dense_numpy = mask

    t0 = time.perf_counter()
    solver.estimate(events, frame=frame, background=frame)
    full_s = time.perf_counter() - t0
    print(f"reference full run: {full_s:.1f} s", flush=True)

    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(path) as f:
        data = json.load(f)
    data["probe_extrapolation_s"] = data["reference_per_frame_s"]
    data["reference_per_frame_s"] = full_s
    data["full_run"] = {
        "resolution": f"{H}x{W}", "n_iter": N_ITER,
        "events": int(len(events)), "wall_s": full_s,
        "note": "measured end-to-end, single frame, bench.py workload",
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(data, indent=1))


if __name__ == "__main__":
    main()
