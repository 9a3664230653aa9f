#!/usr/bin/env python
"""Iteration-schedule sweep: does EPE survive a shorter optimizer schedule?

The parity schedule (n_iter=600 -> 770 optimizer steps across 4 scales,
matching the reference benchmark config) was never swept: round-2 only
established that MORE iterations don't improve EPE-vs-GT.  If the EPE
distribution is unchanged at n_iter=300, the honest per-frame cost halves
(and composes with the exact-ROI fast path).

For each (mode, n_iter) variant this measures, over N shared init seeds at
the bench scale: median fenced solve time, EPE-vs-GT mean/std, and the mean
final finest-scale loss (to show where the objective actually converges).

Run solo on the TPU host:
    nohup python tools/schedule_probe.py > /tmp/schedule.log 2>&1 &
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
N_ITERS = tuple(int(s) for s in
                os.environ.get("EBT_PROBE_ITERS", "600,450,300,150").split(","))


def main():
    events, frame, gt_flow = bench.make_workload()
    ev = events_from_ndarray(events, capacity=bench.CAPACITY)
    fr = jnp.asarray(frame, jnp.float32)

    gen = GenerativeSpec(image_size=(bench.H, bench.W), iwe_sigma=2.0,
                         weight_by_inverse_event_hist=True,
                         optimize_warp=True, poisson_model=True)
    base = PyramidSpec(gen=gen, roi=bench.ROI, coarsest_patch=64,
                       finest_patch=8, n_iter=bench.N_ITER)
    variants = []
    for n_iter in N_ITERS:
        for mode, restrict in (("parity", False), ("roi", True)):
            spec = dataclasses.replace(base, n_iter=n_iter,
                                       restrict_to_roi=restrict)
            variants.append((f"{mode}_{n_iter}", spec))

    mask = jnp.asarray(roi_mask(base))
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
        times, epes, losses = [], [], []
        for i in range(N_SEEDS):
            k = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            flow, aux = fn(ev, fr, mask, k)
            _ = float(flow.sum())
            times.append(time.perf_counter() - t0 - fetch_s)
            epes.append(bench.accuracy_epe(flow, gt_flow))
            losses.append(float(aux["loss_history"][-1][-1]))
        out[name] = {
            "compile_or_coldstart_s": round(compile_s, 1),
            "ms_median": round(float(np.median(times)) * 1e3, 1),
            "epe_mean": round(float(np.mean(epes)), 4),
            "epe_std": round(float(np.std(epes)), 4),
            "final_loss_mean": round(float(np.mean(losses)), 6),
            "epe_per_seed": [round(e, 4) for e in epes],
        }
        print(name, out[name], file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # axon client threads hang interpreter exit
