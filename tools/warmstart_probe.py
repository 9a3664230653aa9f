#!/usr/bin/env python
"""Sequential warm-start sweep: can warm-started frames run a shorter schedule?

The schedule sweep (tools/schedule_probe.py) showed per-frame EPE degrades
below n_iter=450 on COLD solves.  A production pipeline runs sequentially
and can warm-start each frame from the previous frame's solution
(``warm_start: true``, reference patch_eklt_pyramid2.py:234-251), which may
carry convergence across frames and let steady-state frames run far fewer
iterations.  This measures, on an 8-window synthetic sequence at the bench
scale, per-frame EPE and fenced solve time for:

  cold_600            independent frames, parity schedule (baseline)
  warm_600            warm-started, parity schedule
  warm_450/300/150    frame 0 cold at 600, then warm at reduced n_iter
  roi_warm_300        exact-ROI mode composed with warm 300

Each variant is repeated over N_SEEDS init keys (frame-0 init changes the
whole trajectory).  Run solo on the TPU host:
    nohup python tools/warmstart_probe.py > /tmp/warmstart.log 2>&1 &
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

import bench  # noqa: E402  (scale constants + EPE convention)
from event_based_bos_tpu import events_from_ndarray  # noqa: E402
from event_based_bos_tpu.data.synthetic import (  # noqa: E402
    SyntheticBosConfig, generate_sequence,
)
from event_based_bos_tpu.solver import GenerativeSpec, PyramidSpec  # noqa: E402
from event_based_bos_tpu.solver.pyramid import (  # noqa: E402
    estimate_frame, roi_mask, update_coarse_from_fine,
)

N_SEEDS = int(os.environ.get("EBT_PROBE_SEEDS", "4"))
N_WINDOWS = int(os.environ.get("EBT_PROBE_WINDOWS", "8"))


def make_sequence():
    n = bench.CAPACITY - 1024
    cfg = SyntheticBosConfig(height=bench.H, width=bench.W,
                             duration=N_WINDOWS / 30.0, fps=30.0,
                             events_per_frame=n, max_displacement=3.0,
                             plume_speed=900.0, seed=0)
    seq = generate_sequence(cfg)
    ev_all, ts = seq["events"], seq["frame_ts"]
    windows = []
    for i in range(N_WINDOWS):
        m = (ev_all[:, 2] >= ts[i]) & (ev_all[:, 2] < ts[i + 1])
        windows.append(events_from_ndarray(ev_all[m], capacity=bench.CAPACITY))
    frames = [jnp.asarray(seq["frames"][i + 1], jnp.float32)
              for i in range(N_WINDOWS)]
    return windows, frames, seq["gt_flow"]


def main():
    windows, frames, gt_flow = make_sequence()

    gen = GenerativeSpec(image_size=(bench.H, bench.W), iwe_sigma=2.0,
                         weight_by_inverse_event_hist=True,
                         optimize_warp=True, poisson_model=True)
    base = PyramidSpec(gen=gen, roi=bench.ROI, coarsest_patch=64,
                       finest_patch=8, n_iter=bench.N_ITER)
    mask = jnp.asarray(roi_mask(base))

    def spec_of(n_iter, restrict=False):
        return dataclasses.replace(base, n_iter=n_iter,
                                   restrict_to_roi=restrict)

    jitted = {}

    def solve(spec, ev, fr, key, prev):
        k = (spec.n_iter, spec.restrict_to_roi, prev is not None)
        if k not in jitted:
            jitted[k] = jax.jit(functools.partial(estimate_frame, spec=spec))
        return jitted[k](ev, fr, mask, key, prev_params=prev)

    variants = {
        "cold_600": (spec_of(600), spec_of(600), False),
        "warm_600": (spec_of(600), spec_of(600), True),
        "warm_450": (spec_of(600), spec_of(450), True),
        "warm_300": (spec_of(600), spec_of(300), True),
        "warm_150": (spec_of(600), spec_of(150), True),
        "roi_warm_300": (spec_of(600, True), spec_of(300, True), True),
    }

    out = {}
    for name, (spec0, spec_rest, warm) in variants.items():
        epe_chains, ms_steady = [], []
        for s in range(N_SEEDS):
            key = jax.random.PRNGKey(100 + s)
            prev = None
            epes = []
            for i in range(N_WINDOWS):
                spec = spec0 if i == 0 else spec_rest
                t0 = time.perf_counter()
                flow, aux = solve(spec, windows[i], frames[i], key, prev)
                _ = float(flow.sum())  # fence (block_until_ready lies on axon)
                dt = time.perf_counter() - t0
                if i >= 2 and s > 0:  # steady state, compiled programs
                    ms_steady.append(dt * 1e3)
                epes.append(bench.accuracy_epe(flow, gt_flow[i]))
                prev = (jax.tree_util.tree_map(
                            jnp.asarray,
                            update_coarse_from_fine(aux["params_per_scale"],
                                                    spec))
                        if warm else None)
                key = jax.random.fold_in(key, i)
            epe_chains.append(epes)
        arr = np.asarray(epe_chains)  # [seeds, windows]
        out[name] = {
            "ms_steady_median": round(float(np.median(ms_steady)), 1),
            "epe_frame0_mean": round(float(arr[:, 0].mean()), 4),
            "epe_steady_mean": round(float(arr[:, 2:].mean()), 4),
            "epe_steady_std": round(float(arr[:, 2:].std()), 4),
            "epe_per_frame_mean": [round(float(v), 4) for v in arr.mean(0)],
        }
        print(name, out[name], file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # axon client threads hang interpreter exit
