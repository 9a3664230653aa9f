#!/usr/bin/env python
"""Per-component timing of the benchmark solve on the real TPU.

Sub-millisecond programs cannot be timed with one fenced fetch per call on
the axon tunnel (the scalar-fetch barrier costs ~25-35 ms and its jitter
swamps the kernel).  Each component is therefore dispatched N times
back-to-back (TPU executes a single stream in order) with ONE fence at the
end; per-call = total/N.  Published in docs/performance.md.

Run on TPU (solo — nothing else on the host):
    nohup python tools/perf_probe.py > /tmp/perf_probe.log &
"""

import functools
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

from event_based_bos_tpu.utils.misc import (  # noqa: E402
    enable_persistent_cache_if_beneficial,
)

enable_persistent_cache_if_beneficial(os.path.join(REPO, ".jax_cache"))

import jax.numpy as jnp  # noqa: E402

H, W = 720, 1280
ROI = (0, 720, 320, 960)
CAPACITY = 1 << 19


def fence(tree):
    leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")]
    return float(jnp.asarray(leaves[0]).sum())


def time_loop(fn, *args, n=100, warmup=2):
    """Dispatch fn n times back-to-back, one fence; returns seconds/call."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    fence(out)
    fence_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    total = time.perf_counter() - t0 - fence_s
    return max(total / n, 1e-9)


def report(name, seconds, nbytes=None):
    line = f"{name:<46s} {seconds*1e6:10.1f} us"
    if nbytes is not None:
        line += f"   ({nbytes/1e6:8.1f} MB -> {nbytes/seconds/1e9:7.1f} GB/s)"
    print(line, flush=True)


def main():
    import bench
    from event_based_bos_tpu import events_from_ndarray
    from event_based_bos_tpu.ops.gradients import frame_gradients
    from event_based_bos_tpu.solver import GenerativeSpec, PyramidSpec
    from event_based_bos_tpu.solver.generative import (
        dense_objective, iwe_cache, measured_increment, params_to_fields,
        patch_to_dense, predict_increment)
    from event_based_bos_tpu.solver.pyramid import (estimate_frame,
                                                    pyramid_grids,
                                                    scale_iterations, roi_mask)

    events, frame, _gt = bench.make_workload()
    print(f"devices: {jax.devices()}", flush=True)

    results = {}
    for dtype_name, cd in (("f32", None), ("bf16", jnp.bfloat16)):
        gen = GenerativeSpec(image_size=(H, W), iwe_sigma=2.0,
                             weight_by_inverse_event_hist=True,
                             optimize_warp=True, poisson_model=True,
                             compute_dtype=cd)
        spec = PyramidSpec(gen=gen, roi=ROI, coarsest_patch=64,
                           finest_patch=8, n_iter=600)
        ev = events_from_ndarray(events, capacity=CAPACITY)
        fr = jnp.asarray(frame, jnp.float32)
        mask = jnp.asarray(roi_mask(spec))
        key = jax.random.PRNGKey(0)

        print(f"\n=== compute_dtype={dtype_name} ===", flush=True)

        solve = jax.jit(functools.partial(estimate_frame, spec=spec))
        t = time_loop(lambda: solve(ev, fr, mask, key)[0], n=5, warmup=1)
        report("full solve (600 iters)", t)
        results[f"solve_{dtype_name}"] = t

        cache_fn = jax.jit(functools.partial(iwe_cache, spec=gen))
        t = time_loop(lambda: cache_fn(ev), n=20)
        report("iwe_cache (scatter + blurs)", t)
        results[f"iwe_{dtype_name}"] = t

        gx, gy = jax.jit(frame_gradients)(fr)
        hist, weights, wi = cache_fn(ev)
        measured = measured_increment(hist, weights) * mask
        cdt = cd or jnp.float32
        meas_c = measured.astype(cdt)
        gx_c, gy_c = gx.astype(cdt), gy.astype(cdt)
        wi_c, mask_c = wi.astype(cdt), mask.astype(cdt)

        total_step_us = 0.0
        for grid, n_it in zip(pyramid_grids(spec), scale_iterations(spec)):
            vg = jax.jit(jax.value_and_grad(
                lambda p, _g=grid: dense_objective(
                    p, meas_c, gx_c, gy_c, wi_c, mask_c, _g, gen)[0]))
            params = jax.random.normal(key, (3,) + grid.shape,
                                       jnp.float32) * 0.1
            t = time_loop(lambda: vg(params), n=100)
            report(f"objective fwd+grad grid {grid.shape}", t)
            total_step_us += t * n_it
        print(f"sum over schedule (fwd+grad only): "
              f"{total_step_us*1e3:.1f} ms", flush=True)

        grid = pyramid_grids(spec)[-1]
        params = jax.random.normal(key, (3,) + grid.shape, jnp.float32) * 0.1
        obj = jax.jit(lambda p: dense_objective(
            p, meas_c, gx_c, gy_c, wi_c, mask_c, grid, gen)[0])
        t = time_loop(lambda: obj(params), n=100)
        report("objective fwd only (finest grid)", t)

        p2d = jax.jit(lambda p: patch_to_dense(p.astype(cdt), grid))
        t = time_loop(lambda: p2d(params), n=100)
        report("patch_to_dense (3 fields)", t,
               3 * H * W * (4 if cd is None else 2))

        f2f = jax.jit(lambda p: params_to_fields(p, grid, gen))
        fields = f2f(params)
        pred = jax.jit(lambda f: predict_increment(
            f["flow"], gx_c, gy_c, gen, f.get("pxy"), mask=mask_c))
        t = time_loop(lambda: pred(fields), n=100)
        # fused lower bound: read gx,gy,flow,pxy,mask + write pred
        report("predict_increment (warp + dot + norm)", t,
               7 * H * W * (4 if cd is None else 2))

        vgp = jax.jit(jax.value_and_grad(
            lambda f: jnp.sum(predict_increment(
                f["flow"], gx_c, gy_c, gen, f.get("pxy"), mask=mask_c)
                * meas_c)))
        t = time_loop(lambda: vgp(fields), n=100)
        report("predict_increment fwd+grad (dense cotangent)", t)

    # pure HBM-stream probe: elementwise op over [2, H, W]
    big = jnp.zeros((2, H, W), jnp.float32)
    ew = jax.jit(lambda x: x * 0.999 + 0.001)
    t = time_loop(lambda: ew(big), n=200)
    report("\nelementwise [2,H,W] f32 (HBM stream probe)", t,
           2 * H * W * 4 * 2)

    a = results.get("solve_f32")
    b = results.get("solve_bf16")
    if a and b:
        print(f"\nbf16 speedup on full solve: {a/b:.3f}x", flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
