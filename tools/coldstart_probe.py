#!/usr/bin/env python
"""Cold-start stall characterization (VERDICT r2 #5).

A fresh process pays a one-time stall of 10 s – 24 min on the FIRST
execution of the big solve program on this remote ("axon") TPU backend.
Interleaved A/B sampling (results in the goldens JSON, ``ab_interleaved``)
shows the stall distribution is heavy-tailed and INDEPENDENT of the client
persistent cache — it is server-side program load/autotune, not client
compilation.  This probe runs one variant per fresh subprocess and records:

  * ``dispatch_s`` — time for the jitted call to return (client trace+lower,
    persistent-cache hits make this seconds),
  * ``first_exec_s`` — time until the first scalar fetch returns (the stall),
  * ``second_exec_s`` — steady-state solve+fetch.

Variants isolate what the stall scales with:
  * ``full``          — benchmark program (720×1280, n_iter 600, cap 2^19)
  * ``short_sched``   — same structure, n_iter 75 (scan trip counts only)
  * ``small_cap``     — capacity 2^15 (smaller scatter)
  * ``small_frame``   — 240×320 (smaller dense program)

If the stall is ~constant across n_iter, it is program-load/autotune bound,
not trip-count bound; if it shrinks with frame size, it scales with program
tensor sizes.  Results land in ``tests/goldens/coldstart_probe.json``.

Run:  python tools/coldstart_probe.py [variant ...]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "goldens", "coldstart_probe.json")

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import jax
# honor EBT_PERSISTENT_CACHE=0 like the library does
# (utils.misc.enable_persistent_cache_if_beneficial) so the cache-off arm
# of the A/B recorded in tests/goldens/coldstart_probe.json stays
# reproducible with this tool
if os.environ.get("EBT_PERSISTENT_CACHE", "1") != "0":
    jax.config.update("jax_compilation_cache_dir", os.path.join({repo!r}, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import functools
import numpy as np, jax.numpy as jnp
from event_based_bos_tpu import events_from_ndarray
from event_based_bos_tpu.solver import GenerativeSpec, PyramidSpec
from event_based_bos_tpu.solver.pyramid import estimate_frame, roi_mask

H, W, CAP, NIT = {h}, {w}, {cap}, {nit}
rng = np.random.default_rng(0)
n = CAP - 512
arr = np.stack([rng.uniform(0, H - 1, n), rng.uniform(0, W - 1, n),
                np.sort(rng.uniform(0, 0.01, n)),
                rng.integers(0, 2, n) * 2.0 - 1.0], 1)
ev = events_from_ndarray(arr, capacity=CAP)
gen = GenerativeSpec(image_size=(H, W), iwe_sigma=2.0,
                     weight_by_inverse_event_hist=True,
                     optimize_warp=True, poisson_model=True)
spec = PyramidSpec(gen=gen, roi=(0, H, W // 4, 3 * W // 4),
                   coarsest_patch=64 if H >= 512 else 32, finest_patch=8,
                   n_iter=NIT)
frame = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
mask = jnp.asarray(roi_mask(spec))
fn = jax.jit(functools.partial(estimate_frame, spec=spec))

t0 = time.perf_counter()
flow, _ = fn(ev, frame, mask, jax.random.PRNGKey(0))
t1 = time.perf_counter()
_ = float(flow.sum())
t2 = time.perf_counter()
flow, _ = fn(ev, frame, mask, jax.random.PRNGKey(1))
_ = float(flow.sum())
t3 = time.perf_counter()
print(json.dumps({{"dispatch_s": t1 - t0, "first_exec_s": t2 - t1,
                   "second_exec_s": t3 - t2}}), flush=True)
os._exit(0)
"""

VARIANTS = {
    "full":        dict(h=720, w=1280, cap=1 << 19, nit=600),
    "short_sched": dict(h=720, w=1280, cap=1 << 19, nit=75),
    "small_cap":   dict(h=720, w=1280, cap=1 << 15, nit=600),
    "small_frame": dict(h=240, w=320, cap=1 << 19, nit=600),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    for name in names:
        cfg = VARIANTS[name]
        print(f"=== {name} {cfg} ===", flush=True)
        code = CHILD.format(repo=REPO, **cfg)
        p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=1800)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not line:
            print("FAILED:", p.stdout[-500:], p.stderr[-1000:], flush=True)
            continue
        results[name] = {**cfg, **json.loads(line[-1])}
        print(json.dumps(results[name]), flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
