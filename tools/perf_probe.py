#!/usr/bin/env python
"""Per-component timing of the benchmark solve on the real TPU.

Breaks the 600-iteration pyramid solve into its constituent device programs
and times each with the fenced harness (axon's block_until_ready is a no-op;
utils.tracing.timeit fetches a scalar).  Published in docs/performance.md:
this is the measured roofline story behind the per-frame number and the
resolution of the "bf16 saves nothing" paradox.

Run on TPU:  nohup python tools/perf_probe.py > /tmp/perf_probe.log &
"""

import functools
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

H, W = 720, 1280
ROI = (0, 720, 320, 960)
CAPACITY = 1 << 19


def report(name, seconds, nbytes=None):
    line = f"{name:<44s} {seconds*1e6:10.1f} us"
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
                                                    pyramid_grids, roi_mask)
    from event_based_bos_tpu.utils.tracing import timeit

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

        # whole solve
        fn = jax.jit(functools.partial(estimate_frame, spec=spec))
        t = timeit(lambda: fn(ev, fr, mask, key), repeats=3)
        report("full solve (600 iters)", t)
        results[f"solve_{dtype_name}"] = t

        # pieces at the FINEST grid (90x160 patches) where most iters run
        gx, gy = jax.jit(frame_gradients)(fr)
        cache = jax.jit(functools.partial(iwe_cache, spec=gen))(ev)
        hist, weights, wi = cache
        t = timeit(lambda: jax.jit(
            functools.partial(iwe_cache, spec=gen))(ev), repeats=5)
        report("iwe_cache (scatter + blurs)", t)

        grid = pyramid_grids(spec)[-1]
        params = jax.random.normal(key, (3,) + grid.shape, jnp.float32) * 0.1
        measured = measured_increment(hist, weights) * mask

        cdt = cd or jnp.float32
        args = dict(measured=measured.astype(cdt), gx=gx.astype(cdt),
                    gy=gy.astype(cdt), weight_inverse=wi.astype(cdt),
                    mask=mask.astype(cdt))

        obj = jax.jit(lambda p: dense_objective(
            p, args["measured"], args["gx"], args["gy"],
            args["weight_inverse"], args["mask"], grid, gen)[0])
        t = timeit(lambda: obj(params), repeats=10)
        report("objective fwd (finest grid)", t)
        vg = jax.jit(jax.value_and_grad(lambda p: dense_objective(
            p, args["measured"], args["gx"], args["gy"],
            args["weight_inverse"], args["mask"], grid, gen)[0]))
        t = timeit(lambda: vg(params), repeats=10)
        report("objective fwd+grad (finest grid)", t)
        results[f"vg_{dtype_name}"] = t

        # sub-pieces
        p2d = jax.jit(lambda p: patch_to_dense(p.astype(cdt), grid))
        t = timeit(lambda: p2d(params), repeats=10)
        bytes_p2d = (3 * H * W) * np.dtype(np.float32 if cd is None else np.float16).itemsize
        report("patch_to_dense (3 fields)", t, bytes_p2d)

        fields = jax.jit(lambda p: params_to_fields(p, grid, gen))(params)
        pred = jax.jit(lambda f: predict_increment(
            f["flow"], args["gx"], args["gy"], gen, f.get("pxy"),
            mask=args["mask"]))
        t = timeit(lambda: pred(fields), repeats=10)
        # stencil warp reads 2 gradient images x9 taps (fused: 1 read + FMA)
        bytes_pred = (6 * H * W) * (4 if cd is None else 2)
        report("predict_increment (warp + dot + norm)", t, bytes_pred)

    # scan-overhead probe: 150 iterations of a trivial elementwise body on a
    # dense [2, H, W] carry — what does the sequential loop itself cost?
    x0 = jnp.zeros((3, 90, 160), jnp.float32)

    def trivial(c, _):
        return c * 0.999 + 0.001, None

    scan_fn = jax.jit(lambda x: jax.lax.scan(trivial, x, None, length=150)[0])
    from event_based_bos_tpu.utils.tracing import timeit as ti

    t = ti(lambda: scan_fn(x0), repeats=5)
    report("\nscan of 150 trivial steps (tiny carry)", t)

    big = jnp.zeros((2, H, W), jnp.float32)

    def trivial_big(c, _):
        return c * 0.999 + 0.001, None

    scan_big = jax.jit(lambda x: jax.lax.scan(trivial_big, x, None, length=150)[0])
    t = ti(lambda: scan_big(x0 := big), repeats=5)
    report("scan of 150 trivial steps (2xHxW carry)", t,
           150 * 2 * H * W * 4 * 2)

    if results.get("solve_f32") and results.get("solve_bf16"):
        print(f"\nbf16 speedup on full solve: "
              f"{results['solve_f32']/results['solve_bf16']:.3f}x", flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
