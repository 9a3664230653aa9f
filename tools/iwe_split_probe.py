#!/usr/bin/env python
"""A/B the IWE-cache dispatch split at benchmark scale (VERDICT r4 #1).

The per-frame polarity histogram is a *constant* input to the pyramid solve
(events enter the objective only through it — SURVEY §3.2).  Round 4 found
the Pallas hat-matmul vote kernel 3.4× faster than the XLA scatter in
isolation but ~10 ms *slower* embedded in the one big jitted solve program.
This probe measures the obvious middle path: dispatch the cache as its own
small program feeding the solve (``estimate_frame(..., cache=...)``), in
three variants, interleaved round-robin (the backend drifts):

  fused_scatter   cache inside the solve program (round-4 default)
  split_scatter   standalone cache program, XLA scatter vote
  split_pallas    standalone cache program, Pallas hat-matmul vote

Also reports the isolated cache-program times and asserts on-chip
bit-exactness of the Pallas vote vs the scatter (integer sensor coords)
and solve-output equivalence across variants.

Run solo on the TPU host:  python tools/iwe_split_probe.py
"""

import dataclasses
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from event_based_bos_tpu.utils.misc import (  # noqa: E402
    enable_persistent_cache_if_beneficial,
)

enable_persistent_cache_if_beneficial(os.path.join(REPO, ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from event_based_bos_tpu import events_from_ndarray  # noqa: E402
from event_based_bos_tpu.solver import GenerativeSpec, PyramidSpec  # noqa: E402
from event_based_bos_tpu.solver.generative import iwe_cache  # noqa: E402
from event_based_bos_tpu.solver.pyramid import estimate_frame, roi_mask  # noqa: E402

REPEATS = int(os.environ.get("EBT_PROBE_REPEATS", "12"))


def fence(x) -> float:
    return float(x.sum())


def main():
    events, frame, gt_flow = bench.make_workload()
    gen = GenerativeSpec(image_size=(bench.H, bench.W), iwe_sigma=2.0,
                         weight_by_inverse_event_hist=True,
                         optimize_warp=True, poisson_model=True)
    spec = PyramidSpec(gen=gen, roi=bench.ROI, coarsest_patch=64,
                       finest_patch=8, n_iter=bench.N_ITER)
    ev = events_from_ndarray(events, capacity=bench.CAPACITY)
    fr = jnp.asarray(frame, jnp.float32)
    mask = jnp.asarray(roi_mask(spec))
    key = jax.random.PRNGKey(0)

    cache_scatter = jax.jit(functools.partial(iwe_cache, spec=gen))
    cache_pallas = jax.jit(functools.partial(
        iwe_cache, spec=dataclasses.replace(gen, pallas_iwe=True)))
    solve = jax.jit(functools.partial(estimate_frame, spec=spec))

    # --- compile + on-chip equivalence ------------------------------------
    cs = cache_scatter(ev)
    cp = cache_pallas(ev)
    max_abs = float(jnp.max(jnp.abs(cs[0] - cp[0])))
    bitexact = bool(jnp.all(cs[0] == cp[0]))
    print(f"cache pallas vs scatter: max|Δhist|={max_abs:.3e} "
          f"bit-exact={bitexact}", flush=True)
    assert max_abs == 0.0, "Pallas vote differs from scatter on-chip"

    flow_f, _ = solve(ev, fr, mask, key)                       # fused trace
    flow_s, _ = solve(ev, fr, mask, key, cache=cs)             # split trace
    flow_p, _ = solve(ev, fr, mask, key, cache=cp)
    d_fs = float(jnp.max(jnp.abs(flow_f - flow_s)))
    d_sp = float(jnp.max(jnp.abs(flow_s - flow_p)))
    print(f"solve fused-vs-split max|Δflow|={d_fs:.3e}; "
          f"split scatter-vs-pallas {d_sp:.3e}", flush=True)

    # --- timing ------------------------------------------------------------
    _ = fence(flow_f)
    t0 = time.perf_counter()
    for _ in range(3):
        _ = fence(flow_f)
    fetch_s = (time.perf_counter() - t0) / 3

    def run_fused(k):
        f, _ = solve(ev, fr, mask, k)
        return fence(f)

    def run_split(cache_fn, k):
        c = cache_fn(ev)
        f, _ = solve(ev, fr, mask, k, cache=c)
        return fence(f)

    variants = {
        "fused_scatter": run_fused,
        "split_scatter": functools.partial(run_split, cache_scatter),
        "split_pallas": functools.partial(run_split, cache_pallas),
    }
    # throwaway timing loop (first timed program reads high on this backend)
    for fn in variants.values():
        fn(key)
    times = {k: [] for k in variants}
    for i in range(REPEATS):
        for name, fn in variants.items():
            k = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            fn(k)
            times[name].append(time.perf_counter() - t0 - fetch_s)

    # isolated cache-program times (chained to avoid per-run fetch noise)
    iso = {}
    for name, cfn in (("cache_scatter", cache_scatter),
                      ("cache_pallas", cache_pallas)):
        out = cfn(ev)
        _ = fence(out[0])
        t0 = time.perf_counter()
        for _ in range(10):
            out = cfn(ev)
        _ = fence(out[0])
        iso[name] = (time.perf_counter() - t0 - fetch_s) / 10

    result = {
        "ms_median": {k: round(float(np.median(v)) * 1e3, 2)
                      for k, v in times.items()},
        "ms_all": {k: [round(x * 1e3, 2) for x in v]
                   for k, v in times.items()},
        "cache_iso_ms": {k: round(v * 1e3, 2) for k, v in iso.items()},
        "pallas_bitexact_on_chip": bitexact,
        "flow_max_abs_diff": {"fused_vs_split_scatter": d_fs,
                              "split_scatter_vs_pallas": d_sp},
        "repeats": REPEATS,
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # axon client threads hang interpreter exit
