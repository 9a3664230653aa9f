#!/usr/bin/env python
"""Measure what ``prewarm: true`` hides of the first-frame stall.

The first execution of the big solve program on this remote backend stalls
10 s – 24 min (heavy-tailed, server-side — ``docs/performance.md`` §cold
start), so SINGLE samples cannot compare the arms; this probe runs N fresh
CLI processes per arm, interleaved (A/B/A/B…), at the full benchmark scale
with 2 frames, and reports per-run "wall to first pred_flow .npy" plus the
profile sections (prepare vs solve wait).  What prewarm can save is bounded
by the host-prep time it overlaps (synthetic generation + Farnebäck here:
tens of seconds), so expect the arms to differ by roughly that prep time
*when* the stall exceeds it.

Run solo on the TPU host (budget ~N × 2 × (stall lottery) — hours):
    EBT_PREWARM_SAMPLES=3 nohup python tools/prewarm_probe.py \
        > /tmp/prewarm_ab.log 2>&1 &
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("EBT_PREWARM_SAMPLES", "3"))


def build_config(out_dir: str, prewarm: bool) -> dict:
    h, w = 720, 1280
    return {
        "data": {"root": "", "dataset": "SYNTHETIC", "sequence": "plume1",
                 "height": h, "width": w, "duration": 4 / 30.0, "fps": 30,
                 "events_per_frame": 480_000, "max_displacement": 3.0,
                 "warp": False, "n_events_per_batch": 480_000},
        "output_dir": out_dir,
        "profile": True,
        "prewarm": prewarm,
        "evaluation": {"metrics": ["flow"], "time_list": [[0.03, 0.1]]},
        "common_params": {"n_frames": 1, "xmin": 0, "xmax": h,
                          "ymin": 320, "ymax": 960},
        "solver": {
            "filter": {"filters": None, "parameters": {}},
            "method": "patch_eklt_pyramid2",
            "outer_padding": 0,
            "cost_with_weight": {"diff_norm": 1.0, "image_gradient": 0.5,
                                 "flow_norm_pxy": 0.1},
            "optimizer": {"method": "Adam", "n_iter": 600},
            "generative_ml": {
                "weight_loss_by_event_hist": False, "weight_sigma": 5,
                "weight_loss_by_inverse_event_hist": True,
                "optimize_warp": True, "iwe_sigma": 2,
                "viz_diff_scale": [-0.25, 0.25], "no_polarity": False,
                "model_image": "current", "use_log_intensity": False,
                "poisson_model": True,
            },
            "patch_eklt": {"patch_size": 4, "sliding_window": 2,
                           "do_event_thresholding": False, "event_thres": 8,
                           "coarsest_patch_size": 64, "finest_patch_size": 8},
        },
        "method": "opencv_flow",
        "estimation_method": "solver",
        "params_opencv_flow": {"pyr_scale": 0.5, "levels": 3, "winsize": 10,
                               "iterations": 2, "poly_n": 5,
                               "poly_sigma": 1.2, "flags": 0},
    }


def run_once(prewarm: bool) -> dict:
    import yaml

    out = tempfile.mkdtemp(prefix=f"pw_{'on' if prewarm else 'off'}_")
    run_dir = os.path.join(out, "run")
    cfg_path = os.path.join(out, "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(build_config(run_dir, prewarm), f)
    t0 = time.perf_counter()
    # fresh process per sample: the stall is a once-per-process event
    proc = subprocess.run(
        [sys.executable, "-m", "event_based_bos_tpu.cli",
         "--config_file", cfg_path, "--eval", "--log", "info"],
        cwd=REPO, capture_output=True, text=True, timeout=3600)
    wall = time.perf_counter() - t0
    first_npy = None
    for f in sorted(os.listdir(run_dir)) if os.path.isdir(run_dir) else []:
        if f.startswith("pred_flow") and f.endswith(".npy"):
            first_npy = os.path.getmtime(os.path.join(run_dir, f))
            break
    rec = {"prewarm": prewarm, "rc": proc.returncode,
           "wall_s": round(wall, 1),
           "to_first_flow_s": (round(first_npy - (time.time() - wall), 1)
                               if first_npy else None)}
    shutil.rmtree(out, ignore_errors=True)
    return rec


def main():
    runs = []
    for i in range(N):
        for arm in (False, True):  # interleaved A/B
            rec = run_once(arm)
            rec["sample"] = i
            runs.append(rec)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"runs": runs}, indent=1))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
