"""Sequence-throughput probe: synchronous vs pipelined evaluation loop.

Runs the full hot_plate1-scale evaluation pipeline (synthetic BOS recording,
Farnebäck GT, pyramid solve, visualizations, error texts) end-to-end through
``cli.evaluate_per_frames`` twice — ``pipeline: false`` and ``pipeline: true``
— and reports wall-clock seconds per frame for each.  The pipelined loop
overlaps host preparation (frame IO + Farnebäck) of frame *i+1* with the
device solve of frame *i* and the host finalization (PNG rendering, error
texts) of frame *i−1*.

Usage:  python tools/throughput_probe.py [n_frames] [--small]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_based_bos_tpu.utils.misc import (  # noqa: E402
    enable_persistent_cache_if_beneficial,
)

enable_persistent_cache_if_beneficial(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))


def build_config(out_dir: str, n_frames: int, small: bool) -> dict:
    if small:
        h, w, epf, n_iter, coarsest = 96, 128, 8000, 60, 16
        ymin, ymax = 16, 112
    else:
        h, w, epf, n_iter, coarsest = 720, 1280, 480_000, 600, 64
        ymin, ymax = 320, 960
    duration = (n_frames + 2) / 30.0
    return {
        "data": {"root": "", "dataset": "SYNTHETIC", "sequence": "plume1",
                 "height": h, "width": w, "duration": duration, "fps": 30,
                 "events_per_frame": epf, "max_displacement": 3.0,
                 "warp": False},
        "output_dir": out_dir,
        "profile": True,
        "evaluation": {"metrics": ["flow"],
                       "time_list": [[0.03, duration - 1e-6]]},
        "common_params": {"n_frames": 1, "xmin": 0, "xmax": h,
                          "ymin": ymin, "ymax": ymax},
        "solver": {
            "filter": {"filters": None, "parameters": {}},
            "method": "patch_eklt_pyramid2",
            "outer_padding": 0,
            "cost_with_weight": {"diff_norm": 1.0, "image_gradient": 0.5,
                                 "flow_norm_pxy": 0.1},
            "optimizer": {"method": "Adam", "n_iter": n_iter},
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
                           "coarsest_patch_size": coarsest,
                           "finest_patch_size": 8},
        },
        "method": "opencv_flow",
        "estimation_method": "solver",
        "params_opencv_flow": {"pyr_scale": 0.5, "levels": 3, "winsize": 10,
                               "iterations": 2, "poly_n": 5,
                               "poly_sigma": 1.2, "flags": 0},
    }


def run_once(pipeline: bool, n_frames: int, small: bool,
             serve: bool = False, wire: bool = False,
             fast: bool = False, seq_mesh: bool = False,
             legacy_wire: bool = False) -> dict:
    import yaml

    from event_based_bos_tpu import cli

    out = tempfile.mkdtemp(prefix=f"thr_{'pipe' if pipeline else 'sync'}_")
    cfg = build_config(os.path.join(out, "run"), n_frames, small)
    cfg["pipeline"] = pipeline
    if legacy_wire:
        # round-4-equivalent default path: uncompressed f32 event uploads
        # and the full-frame GT upload (the round-5 default engages the
        # exact wire + cropped-GT upload opportunistically — both
        # bit-identical, so this A/B isolates pure wire-byte time)
        from event_based_bos_tpu.solver import api as solver_api

        cfg["solver"]["quantized_upload"] = "direct"
        solver_api._GT_CROP_ENABLED = False
        solver_api._BUNDLE_SHRINK_ENABLED = False
    if seq_mesh:
        # single-chip sequential mesh: the segmented loop's built-in
        # one-step pipeline (produce t+1 ‖ device step t) on one lane
        cfg["mesh"] = {"data": 1, "event": 1, "sequential": True}
        cfg["solver"]["warm_start"] = True
    if serve:
        cfg["visualize"] = False
    if wire:
        # quantized event upload + half-precision flow fetch.  "round"
        # mode: the synthetic stream's timestamps are continuous (off the
        # µs grid), so the "exact" wire would fall back to float32 for the
        # t-carrying preprocess upload; rounding (≤0.5 µs) keeps the
        # 9 B/event wire.  Coordinates are integers — decoded bit-exactly.
        cfg["solver"]["quantized_upload"] = "round"
        cfg["solver"]["flow_fetch_dtype"] = "float16"
    if fast:
        # the measured production recipe (docs/performance.md §schedule
        # scaling): exact-ROI box compute + warm-started frames on the
        # EPE-neutral half schedule
        cfg["solver"]["restrict_to_roi"] = True
        cfg["solver"]["warm_start"] = True
        cfg["solver"]["steady_n_iter"] = 300
    cfg_path = os.path.join(out, "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    try:
        t0 = time.perf_counter()
        rc = cli.main(["--config_file", cfg_path, "--eval",
                       "--log", "warning"])
        wall = time.perf_counter() - t0
    finally:
        if legacy_wire:
            from event_based_bos_tpu.solver import api as solver_api

            solver_api._GT_CROP_ENABLED = True
            solver_api._BUNDLE_SHRINK_ENABLED = True
    assert rc == 0
    n_done = sum(1 for line in open(os.path.join(
        out, "run", "flow_error_per_frame_without_mask.txt")))
    # steady-state rate from per-frame artifact mtimes: drops the one-time
    # compile + heavy-tailed server-side first-execution stall of frame 1
    # (cache-independent — see docs/performance.md), which dominates
    # wall/n at small n
    run_dir = os.path.join(out, "run")
    stamps = sorted(os.path.getmtime(os.path.join(run_dir, f))
                    for f in os.listdir(run_dir)
                    if f.startswith("pred_flow") and f.endswith(".npy"))
    import numpy as np
    steady = (float(np.median(np.diff(stamps))) if len(stamps) >= 3
              else wall / max(n_done, 1))
    shutil.rmtree(out, ignore_errors=True)
    return {"pipeline": pipeline, "wall_s": wall, "frames": n_done,
            "s_per_frame": wall / max(n_done, 1),
            "steady_s_per_frame": steady}


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 8
    small = "--small" in sys.argv
    # warmup run populates the persistent compile cache so both timed runs
    # see warm compiles (first-program penalty documented in
    # docs/performance.md)
    if "--fast-only" in sys.argv:
        # production recipe: serving + wire + exact-ROI + warm/steady —
        # its programs are small (ROI box), so no parity-size warmup run
        serve_f = run_once(True, n_frames, small, serve=True, wire=True,
                           fast=True)
        print(json.dumps({
            "serving_fast_s_per_frame": round(serve_f["s_per_frame"], 3),
            "serving_fast_steady": round(serve_f["steady_s_per_frame"], 3),
            "frames": serve_f["frames"]}))
        sys.stdout.flush()
        os._exit(0)
    if "--err-ab" in sys.argv:
        # interleaved A/B of the serving loop's error-pair placement:
        # pre-dispatched behind the solve (flow_errors_async) vs the
        # synchronous finalize-side dispatch (calculate_flow_errors, which
        # re-uploads both flow crops and queues behind the next frame's
        # solve).  Nulling the method makes the CLI take the fallback.
        from event_based_bos_tpu.solver import api as solver_api

        orig = solver_api.SolverBase.flow_errors_async
        run_once(True, 2, small, serve=True)  # warm compiles
        out = {}
        try:
            for rep in (1, 2):
                for tag, on in (("pre", True), ("sync", False)):
                    solver_api.SolverBase.flow_errors_async = (
                        orig if on else None)
                    r = run_once(True, n_frames, small, serve=True)
                    out[f"serving_{tag}{rep}_steady"] = round(
                        r["steady_s_per_frame"], 3)
                    out[f"serving_{tag}{rep}_wall"] = round(
                        r["s_per_frame"], 3)
        finally:
            # a failed run_once (its rc assert) must not leave the class
            # attribute nulled for whatever runs after (ADVICE r4)
            solver_api.SolverBase.flow_errors_async = orig
        print(json.dumps(out))
        sys.stdout.flush()
        os._exit(0)
    if "--seq-mesh-only" in sys.argv:
        # sequential-mesh serving on one lane: measures the segmented
        # loop's built-in produce‖solve overlap at the full scale
        seq = run_once(False, n_frames, small, serve=True, seq_mesh=True)
        print(json.dumps({
            "seq_mesh_s_per_frame": round(seq["s_per_frame"], 3),
            "seq_mesh_steady": round(seq["steady_s_per_frame"], 3),
            "frames": seq["frames"]}))
        sys.stdout.flush()
        os._exit(0)
    if "--viz-ab" in sys.argv:
        # interleaved A/B of the round-5 default wire cuts in the plain
        # (non-wire-config) visualize-on loop: opportunistic exact event
        # wire (9 B/event vs 17) + cropped-GT upload (box vs full frame),
        # both bit-identical, vs the round-4-equivalent direct-upload path
        run_once(False, 2, small)  # warm compiles
        out = {}
        for rep in (1, 2):
            for tag, legacy in (("new", False), ("legacy", True)):
                r = run_once(True, n_frames, small, legacy_wire=legacy)
                out[f"viz_{tag}{rep}_steady"] = round(
                    r["steady_s_per_frame"], 3)
                out[f"viz_{tag}{rep}_wall"] = round(r["s_per_frame"], 3)
        print(json.dumps(out))
        sys.stdout.flush()
        os._exit(0)
    if "--visualize-only" in sys.argv:
        # full-artifact evaluation loop (visualize on): the round-4
        # device-polar colorization + cv2 PNG path (VERDICT r3 #4), plus
        # the wire-composed variant (quantized upload, f16 flow fetch +
        # f16 GT upload) — at steady state the loop is tunnel-byte-bound
        run_once(False, 2, small)
        pipe = run_once(True, n_frames, small)
        pipe_w = run_once(True, n_frames, small, wire=True)
        print(json.dumps({
            "visualize_pipelined_s_per_frame": round(pipe["s_per_frame"], 3),
            "visualize_pipelined_steady": round(pipe["steady_s_per_frame"], 3),
            "visualize_wire_s_per_frame": round(pipe_w["s_per_frame"], 3),
            "visualize_wire_steady": round(pipe_w["steady_s_per_frame"], 3),
            "frames": pipe["frames"]}))
        sys.stdout.flush()
        os._exit(0)
    run_once(False, 2, small)
    if "--serving-only" in sys.argv:
        serve = run_once(True, n_frames, small, serve=True)
        serve_w = run_once(True, n_frames, small, serve=True, wire=True)
        print(json.dumps({
            "serving_s_per_frame": round(serve["s_per_frame"], 3),
            "serving_wire_s_per_frame": round(serve_w["s_per_frame"], 3),
            "serving_steady": round(serve["steady_s_per_frame"], 3),
            "serving_wire_steady": round(serve_w["steady_s_per_frame"], 3),
            "frames": serve["frames"]}))
        sys.stdout.flush()
        os._exit(0)
    sync = run_once(False, n_frames, small)
    pipe = run_once(True, n_frames, small)
    serve = run_once(True, n_frames, small, serve=True)
    serve_w = run_once(True, n_frames, small, serve=True, wire=True)
    speedup = sync["s_per_frame"] / pipe["s_per_frame"]
    print(json.dumps({"sync_s_per_frame": round(sync["s_per_frame"], 3),
                      "pipelined_s_per_frame": round(pipe["s_per_frame"], 3),
                      "serving_s_per_frame": round(serve["s_per_frame"], 3),
                      "serving_wire_s_per_frame": round(serve_w["s_per_frame"], 3),
                      "sync_steady": round(sync["steady_s_per_frame"], 3),
                      "pipelined_steady": round(pipe["steady_s_per_frame"], 3),
                      "serving_steady": round(serve["steady_s_per_frame"], 3),
                      "serving_wire_steady": round(serve_w["steady_s_per_frame"], 3),
                      "frames": sync["frames"],
                      "pipeline_speedup": round(speedup, 3)}))
    # axon client threads otherwise hang the caller (see bench.py)
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
