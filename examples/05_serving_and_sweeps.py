"""Round-3 features tour: exact-ROI fast path, sequential TPE, quantized
serving wire, mesh multi-start, warm-started steady schedule.

Runs on CPU or the TPU chip; no dataset needed.

    python examples/05_serving_and_sweeps.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from event_based_bos_tpu import events_from_ndarray
from event_based_bos_tpu.data.synthetic import SyntheticBosConfig, generate_sequence
from event_based_bos_tpu.solver import GenerativeSpec, PyramidSpec
from event_based_bos_tpu.solver.pyramid import estimate_frame, roi_mask
from event_based_bos_tpu.tpe import run_tpe
from event_based_bos_tpu.types import decode_wire_events, encode_wire_events

H, W = 128, 192
cfg = SyntheticBosConfig(height=H, width=W, duration=0.1, fps=30.0,
                         events_per_frame=12_000, max_displacement=2.0,
                         seed=0)
seq = generate_sequence(cfg)
events, frame = seq["events"], seq["frames"][1]

# --- 1. Exact-ROI fast path: full-frame cost semantics, box-only compute ---
gen = GenerativeSpec(image_size=(H, W), iwe_sigma=2.0,
                     weight_by_inverse_event_hist=True,
                     optimize_warp=True, poisson_model=True)
spec = PyramidSpec(gen=gen, roi=(0, H, 32, 160), coarsest_patch=32,
                   finest_patch=8, n_iter=60, restrict_to_roi=True)
ev = events_from_ndarray(events, capacity=1 << 14)
mask = jnp.asarray(roi_mask(spec))
flow, _ = jax.jit(functools.partial(estimate_frame, spec=spec))(
    ev, jnp.asarray(frame, jnp.float32), mask, jax.random.PRNGKey(0))
print(f"exact-ROI solve: flow {flow.shape}, "
      f"|flow| mean {float(jnp.abs(flow).mean()):.3f}")

# --- 2. Sequential TPE (optuna-default semantics) on any objective ---
res = run_tpe(lambda x: float((x[0] - 1.2) ** 2 + (x[1] + 0.4) ** 2),
              ([-3, -3], [3, 3]), n_trials=60, seed=0)
print(f"TPE found {np.round(res.param, 3)} (loss {res.loss:.4f}) in 60 trials")

# --- 3. Quantized serving wire: 5 B/event, bit-exact decode ---
wire = encode_wire_events(events, capacity=1 << 14, include_t=False)
nbytes = sum(np.asarray(v).nbytes for v in wire.values())
ev_decoded = jax.jit(decode_wire_events)(wire)
ref = events_from_ndarray(events, capacity=1 << 14)
assert np.array_equal(np.asarray(ev_decoded.x), np.asarray(ref.x))
print(f"wire upload: {nbytes / (1 << 14):.1f} B/event slot "
      f"(float32 SoA = 17), decode bit-exact")

# --- 4. Multi-start: best-of-R restarts (shards across a mesh via
#        parallel.make_multichip_multistart when devices are available) ---
ms = dataclasses.replace(spec, n_restarts=4, n_iter=24)
flow_ms, aux = jax.jit(functools.partial(estimate_frame, spec=ms))(
    ev, jnp.asarray(frame, jnp.float32), mask, jax.random.PRNGKey(0))
print(f"multi-start best-of-4: final loss "
      f"{float(aux['loss_history'][-1][-1]):.4f}")

# --- 5. Sequential warm starts + steady schedule: frame 0 runs the full
#        n_iter, warm-started frames hold EPE at half of it (measured:
#        docs/performance.md §schedule scaling).  The CLI wires this via
#        warm_start: true + steady_n_iter in the solver config. ---
from event_based_bos_tpu.solver.pyramid import update_coarse_from_fine

steady = dataclasses.replace(spec, n_iter=30)
solve_cold = jax.jit(functools.partial(estimate_frame, spec=spec))
solve_steady = jax.jit(functools.partial(estimate_frame, spec=steady))
key, prev = jax.random.PRNGKey(1), None
for i in range(3):
    fr = jnp.asarray(seq["frames"][min(i + 1, len(seq["frames"]) - 1)],
                     jnp.float32)
    fn = solve_cold if prev is None else solve_steady
    flow_i, aux = fn(ev, fr, mask, key, prev_params=prev)
    prev = update_coarse_from_fine(aux["params_per_scale"],
                                   spec if i == 0 else steady)
    key = jax.random.fold_in(key, i)
    steps = len(np.asarray(aux["loss_history"][-1]))
    print(f"frame {i}: {'cold' if i == 0 else 'steady'} schedule, "
          f"{steps} finest-scale steps, final loss "
          f"{float(aux['loss_history'][-1][-1]):.4f}")
