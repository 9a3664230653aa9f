#!/usr/bin/env python
"""Measure the fastest honest solve mode: restrict_to_roi + warp_compute_bf16.

Round-3 measured the two independently (docs/performance.md: ROI 128.8 ms,
warp bf16 −6–8 ms on the parity path); this probe measures the parity,
exact-ROI, and exact-ROI+bf16-warp variants in ONE process over N init seeds
at the bench scale, reporting per-frame time and EPE-vs-truth per variant.

Run solo on the TPU host:
    nohup python tools/roi_bf16_probe.py > /tmp/roi_bf16.log 2>&1 &
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

import bench  # noqa: E402  (workload + EPE convention)
from event_based_bos_tpu import events_from_ndarray  # noqa: E402
from event_based_bos_tpu.solver import GenerativeSpec, PyramidSpec  # noqa: E402
from event_based_bos_tpu.solver.pyramid import estimate_frame, roi_mask  # noqa: E402

N_SEEDS = int(os.environ.get("EBT_PROBE_SEEDS", "8"))


def main():
    events, frame, gt_flow = bench.make_workload()
    ev = events_from_ndarray(events, capacity=bench.CAPACITY)
    fr = jnp.asarray(frame, jnp.float32)

    gen = GenerativeSpec(image_size=(bench.H, bench.W), iwe_sigma=2.0,
                         weight_by_inverse_event_hist=True,
                         optimize_warp=True, poisson_model=True)
    parity = PyramidSpec(gen=gen, roi=bench.ROI, coarsest_patch=64,
                         finest_patch=8, n_iter=bench.N_ITER)
    roi = dataclasses.replace(parity, restrict_to_roi=True)
    roi_bf16 = dataclasses.replace(
        roi, gen=dataclasses.replace(gen, warp_compute_bf16=True))
    variants = [("parity", parity), ("roi", roi), ("roi_bf16", roi_bf16)]

    mask = jnp.asarray(roi_mask(parity))
    key = jax.random.PRNGKey(0)
    out = {}
    for name, spec in variants:
        fn = jax.jit(functools.partial(estimate_frame, spec=spec))
        t0 = time.perf_counter()
        flow, _ = fn(ev, fr, mask, key)
        _ = float(flow.sum())  # fence (block_until_ready lies on axon)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            _ = float(flow.sum())
        fetch_s = (time.perf_counter() - t0) / 3
        times, epes = [], []
        for i in range(N_SEEDS):
            k = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            flow, _ = fn(ev, fr, mask, k)
            _ = float(flow.sum())
            times.append(time.perf_counter() - t0 - fetch_s)
            epes.append(bench.accuracy_epe(flow, gt_flow))
        out[name] = {
            "compile_or_coldstart_s": round(compile_s, 1),
            "ms_median": round(float(np.median(times)) * 1e3, 1),
            "epe_mean": round(float(np.mean(epes)), 4),
            "epe_std": round(float(np.std(epes)), 4),
            "epe_per_seed": [round(e, 4) for e in epes],
        }
        print(name, out[name], file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # axon client threads hang interpreter exit
