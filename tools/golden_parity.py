#!/usr/bin/env python
"""Benchmark-scale golden parity: 720×1280 dense flow vs the reference.

Runs the reference PatchEkltPyramid2 and this repo's pyramid solver on the
SAME synthetic-BOS frame window (hot_plate1 geometry: 720×1280, ROI rows
0..720 / cols 320..960, pyramid 64→8) from an IDENTICAL pinned
initialization with a matched (reduced) iteration schedule, then reports
dense-flow MSE / correlation and cross-checks the flow-error text statistics
through both ``read_flow_error_text`` parsers.

Artifacts:
  * ``tests/goldens/pyramid_720x1280_ref_flow.npy`` — reference golden flow
    (regenerate with this script; needed by the EBT_FULL_PARITY test).
  * ``tests/goldens/pyramid_720x1280_meta.json`` — schedule + scene config.
  * results table appended by hand to ``docs/parity_matrix.md``.

Run:  python tools/golden_parity.py          (~10 min, CPU)
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

H, W = 720, 1280
ROI = (0, 720, 320, 960)
N_ITER = int(os.environ.get("EBT_PARITY_ITERS", 40))  # default: matched reduced schedule 8/10/13/20
GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")


def make_scene(seed=0, **overrides):
    """Bench-physics scene by default; ``overrides`` are SyntheticBosConfig
    fields (the ensemble tool's scene-family variants pass e.g. a slower
    plume or a sparser stream)."""
    from event_based_bos_tpu.data.synthetic import (SyntheticBosConfig,
                                                    generate_sequence)

    kw = dict(height=H, width=W, duration=1.0 / 30.0, fps=30.0,
              events_per_frame=(1 << 19) - 1024,
              max_displacement=3.0, plume_speed=900.0, seed=seed)
    kw.update(overrides)
    cfg = SyntheticBosConfig(**kw)
    seq = generate_sequence(cfg)
    return seq["events"], seq["frames"][1], seq["gt_flow"][0]


def pinned_init(seed=2):
    from event_based_bos_tpu.solver.pyramid import pyramid_grids

    spec = my_spec()
    rng = np.random.default_rng(seed)
    prev = []
    for g in pyramid_grids(spec):
        p = np.zeros((3,) + g.shape)
        p[0] = rng.uniform(-1, 1, g.shape)
        prev.append(p)
    return prev


def my_spec(n_iter=N_ITER):
    import jax.numpy as jnp

    from event_based_bos_tpu.solver import GenerativeSpec, PyramidSpec

    gen = GenerativeSpec(image_size=(H, W), iwe_sigma=2.0,
                         weight_by_inverse_event_hist=True,
                         optimize_warp=True, poisson_model=True,
                         dtype=jnp.float64)
    return PyramidSpec(gen=gen, roi=ROI, coarsest_patch=64, finest_patch=8,
                       n_iter=n_iter)


def run_reference(events, frame, prev):
    import torch

    from reference_harness import make_pyramid_solver

    solver = make_pyramid_solver(H, W, coarsest=64, n_iter=N_ITER)
    solver.crop_xmin, solver.crop_xmax = ROI[0], ROI[1]
    solver.crop_ymin, solver.crop_ymax = ROI[2], ROI[3]
    mask = np.zeros((H, W))
    mask[ROI[0]:ROI[1], ROI[2]:ROI[3]] = 1
    solver.estimate_mask_dense_numpy = mask
    solver.set_previous_frame_best_estimation(
        {i + 1: prev[i] for i in range(len(prev))})
    torch.manual_seed(0)
    t0 = time.perf_counter()
    flow = solver.estimate(events, frame=frame, background=frame)
    dt = time.perf_counter() - t0
    print(f"reference solve: {dt:.1f} s", flush=True)
    return np.asarray(flow), dt


def run_mine(events, frame, prev):
    import jax.numpy as jnp

    from event_based_bos_tpu import events_from_ndarray
    from event_based_bos_tpu.solver.pyramid import estimate_frame, roi_mask

    spec = my_spec()
    ev = events_from_ndarray(events, capacity=1 << 19, dtype=jnp.float64)
    mask = jnp.asarray(roi_mask(spec, jnp.float64))
    t0 = time.perf_counter()
    flow, _aux = estimate_frame(ev, jnp.asarray(frame, jnp.float64), mask,
                                jax.random.PRNGKey(0), spec,
                                prev_params=[jnp.asarray(p) for p in prev])
    flow = np.asarray(flow)
    dt = time.perf_counter() - t0
    print(f"my solve (CPU, incl. compile): {dt:.1f} s", flush=True)
    return flow, dt


def error_text_crosscheck(ref_flow, my_flow, gt_flow):
    """Both flows vs GT through both repos' error-text writer/parser."""
    import tempfile

    import jax.numpy as jnp

    from event_based_bos_tpu.ops.flow import calculate_flow_error
    from event_based_bos_tpu.utils import read_flow_error_text
    from reference_harness import load_reference

    ref = load_reference()
    crop = (slice(None), slice(ROI[0], ROI[1]), slice(ROI[2], ROI[3]))
    out = {}
    for name, flow in (("reference", ref_flow), ("mine", my_flow)):
        err = calculate_flow_error(jnp.asarray(gt_flow[crop])[None],
                                   jnp.asarray(flow[crop])[None])
        err = {k: float(v) for k, v in err.items()}
        with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
            for i in range(3):
                f.write(f"frame {i}::" + str(err) + "\n")
            path = f.name
        _data_mine, stat_mine = read_flow_error_text(path)
        _data_ref, stat_ref = ref.utils.misc.read_flow_error_text(path)
        for k in stat_mine:
            for s in ("mean", "rms", "std"):
                a, b = stat_mine[k][s], stat_ref[k][s]
                assert abs(a - b) <= 1e-9 * max(1.0, abs(b)), (k, s, a, b)
        out[name] = err
        os.unlink(path)
    print("error-text parser cross-check: identical stats from both parsers")
    return out


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    events, frame, gt_flow = make_scene()
    prev = pinned_init()

    ref_flow, ref_dt = run_reference(events, frame, prev)
    suffix = "" if N_ITER == 40 else f"_n{N_ITER}"
    np.save(os.path.join(GOLDEN_DIR, f"pyramid_720x1280_ref_flow{suffix}.npy"),
            ref_flow.astype(np.float32))

    my_flow, my_dt = run_mine(events, frame, prev)

    crop = (slice(None), slice(ROI[0], ROI[1]), slice(ROI[2], ROI[3]))
    diff = my_flow[crop] - ref_flow[crop]
    mse = float(np.mean(diff**2))
    corr = float(np.corrcoef(my_flow[crop].ravel(),
                             ref_flow[crop].ravel())[0, 1])
    rel_rmse = float(np.sqrt(np.mean(diff**2)) / ref_flow[crop].std())
    errs = error_text_crosscheck(ref_flow, my_flow, gt_flow)

    meta = {
        "scale": f"{H}x{W}", "roi": ROI, "n_iter": N_ITER,
        "schedule": "pyramid 64->8, Adam, per-scale n_iter//(s-i+1)",
        "flow_mse": mse, "flow_corr": corr, "rel_rmse": rel_rmse,
        "ref_flow_std": float(ref_flow[crop].std()),
        "ref_solve_s": ref_dt, "my_solve_s_cpu_incl_compile": my_dt,
        "epe_vs_gt": {k: v["EPE"] for k, v in errs.items()},
    }
    with open(os.path.join(GOLDEN_DIR,
                           f"pyramid_720x1280_meta{suffix}.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta, indent=1))


if __name__ == "__main__":
    main()
