"""A/B probe: single-chip multi-start execution strategy (map vs vmap).

``n_restarts: R`` on one chip can run its restart lanes either batched
(``jax.vmap``) or sequentially (``jax.lax.map``).  Historically the vmapped
lanes measured ~19× one solve for R=8 at the benchmark scale — batching
breaks the fused VPU layout of the stencil warp — so sequential lanes
should land near the arithmetic floor of R× one solve.

Usage::

    python tools/restart_mode_probe.py [--restarts 8] [--repeats 3]

Prints one JSON line with per-mode medians and writes nothing; paste the
result into docs/performance.md §accuracy headroom.
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (workload + fence helpers)


def measure(spec, ev, frame, mask, key, repeats):
    import jax

    from event_based_bos_tpu.solver.pyramid import estimate_frame

    fn = jax.jit(functools.partial(estimate_frame, spec=spec))
    t0 = time.perf_counter()
    flow, _aux = fn(ev, frame, mask, key)
    _ = float(flow.sum())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        _ = float(flow.sum())
    fetch_s = (time.perf_counter() - t0) / 3
    times = []
    for i in range(repeats):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        flow, _aux = fn(ev, frame, mask, k)
        _ = float(flow.sum())
        times.append(time.perf_counter() - t0 - fetch_s)
    return float(np.median(times)), compile_s, flow


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--restarts", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from event_based_bos_tpu import events_from_ndarray
    from event_based_bos_tpu.solver import GenerativeSpec, PyramidSpec
    from event_based_bos_tpu.solver.pyramid import roi_mask

    events, frame, gt_flow = bench.make_workload()
    H, W, ROI = bench.H, bench.W, bench.ROI
    gen = GenerativeSpec(image_size=(H, W), iwe_sigma=2.0,
                         weight_by_inverse_event_hist=True,
                         optimize_warp=True, poisson_model=True)
    base = PyramidSpec(gen=gen, roi=ROI, coarsest_patch=64, finest_patch=8,
                       n_iter=bench.N_ITER)
    ev = events_from_ndarray(events, capacity=bench.CAPACITY)
    fr = jnp.asarray(frame, jnp.float32)
    mask = jnp.asarray(roi_mask(base))
    key = jax.random.PRNGKey(0)

    single_s, _, _ = measure(base, ev, fr, mask, key, args.repeats)
    out = {"single_start_s": round(single_s, 4), "restarts": args.restarts}
    for mode in ("map", "vmap"):
        spec = dataclasses.replace(base, n_restarts=args.restarts,
                                   restart_mode=mode)
        t, compile_s, flow = measure(spec, ev, fr, mask, key, args.repeats)
        out[mode] = {
            "per_frame_s": round(t, 4),
            "x_single": round(t / single_s, 2),
            "compile_s": round(compile_s, 1),
            "epe_px": round(bench.accuracy_epe(flow, gt_flow), 4),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
