"""Extend the cost registry with a custom term and solve with it.

The cost layer is a plain function registry (``costs.functions``): a cost is
``arg_dict → scalar`` and participates in ``hybrid_cost`` weighting and the
per-term loss history exactly like the built-ins.

    python examples/04_custom_cost.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from event_based_bos_tpu import costs, events_from_ndarray
from event_based_bos_tpu.data.synthetic import (SyntheticBosConfig,
                                                generate_sequence)
from event_based_bos_tpu.solver import GenerativeSpec, PyramidSpec
from event_based_bos_tpu.solver.pyramid import estimate_frame, roi_mask


def divergence_penalty(arg: dict) -> jax.Array:
    """Penalize compressive flow (BOS displacements are near-solenoidal)."""
    flow = arg["flow"]
    div = (jnp.gradient(flow[0], axis=0) + jnp.gradient(flow[1], axis=1))
    return jnp.mean(jnp.abs(div))


def main():
    costs.functions["divergence"] = divergence_penalty

    h, w = 96, 128
    seq = generate_sequence(SyntheticBosConfig(
        height=h, width=w, duration=2 / 30, fps=30,
        events_per_frame=20_000, seed=0))

    gen = GenerativeSpec(
        image_size=(h, w), iwe_sigma=2.0,
        weight_by_inverse_event_hist=True, optimize_warp=True,
        poisson_model=True,
        cost_weights=(("diff_norm", 1.0), ("image_gradient", 0.5),
                      ("flow_norm_pxy", 0.1), ("divergence", 0.2)),
    )
    spec = PyramidSpec(gen=gen, roi=(0, h, 0, w), coarsest_patch=16,
                       finest_patch=8, n_iter=60)
    ev = events_from_ndarray(seq["events"], capacity=1 << 16)
    solve = jax.jit(functools.partial(estimate_frame, spec=spec))
    flow, aux = solve(ev, jnp.asarray(seq["frames"][1], jnp.float32),
                      jnp.asarray(roi_mask(spec)), jax.random.PRNGKey(0))
    hist = aux["term_history"][-1]
    print("per-term losses at the last finest-scale iteration:")
    for name, vals in hist.items():
        print(f"  {name:>16s}: {float(np.asarray(vals)[-1]):.5f}")
    print("flow finite:", bool(np.isfinite(np.asarray(flow)).all()))


if __name__ == "__main__":
    main()
