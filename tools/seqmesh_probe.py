"""Per-stage overhead probe for the sequential-mesh warm step.

Measures, on the 8-virtual-CPU-device mesh at benchmark shape
(192x320, 2^15-event capacity, 2 lanes x (2,4) mesh):

  * the sharded polarity votes + ``psum`` (the only collective),
  * the carry gating (``carry_valid`` tree-where on the feedback pytree),
  * the full warm step (votes + D warm pyramid solves + carry).

The solve share is the remainder.  One host core backs all 8 virtual
devices, so absolute times are not TPU-meaningful — the *ratios* feed the
``docs/scaling.md`` per-stage table (same methodology as the batched-step
rows).  Prints one JSON line.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import dataclasses
import functools
import json
import time

import numpy as np


def main():
    import jax

    # the env vars alone are not honored when the axon TPU plugin is
    # present — force the in-process CPU platform the __graft_entry__ way
    jax.config.update("jax_platforms", "cpu")
    assert jax.device_count() >= 8 and jax.devices()[0].platform == "cpu", \
        jax.devices()

    import jax.numpy as jnp

    from event_based_bos_tpu import events_from_ndarray
    from event_based_bos_tpu.parallel import (make_mesh,
                                              make_multichip_sequential,
                                              sharded_polarity_votes,
                                              stack_events)
    from event_based_bos_tpu.solver import GenerativeSpec, PyramidSpec
    from event_based_bos_tpu.solver.pyramid import roi_mask

    h, w, cap = 192, 320, 1 << 15
    gen = GenerativeSpec(image_size=(h, w), iwe_sigma=2.0,
                         weight_by_inverse_event_hist=True,
                         optimize_warp=True, poisson_model=True)
    spec = PyramidSpec(gen=gen, roi=(0, h, 64, 256), coarsest_patch=32,
                       finest_patch=8, n_iter=77)
    steady = dataclasses.replace(spec, n_iter=30)

    def window(seed):
        r = np.random.default_rng(seed)
        n = cap - 700
        arr = np.stack([r.uniform(0, h - 1, n), r.uniform(0, w - 1, n),
                        np.sort(r.uniform(0, 0.01, n)),
                        r.integers(0, 2, n) * 2.0 - 1.0], 1)
        return (events_from_ndarray(arr, capacity=cap),
                jnp.asarray(r.uniform(0, 255, (h, w)), jnp.float32))

    mesh = make_mesh((2, 4), ("data", "event"))
    step_cold, step_warm = make_multichip_sequential(spec, mesh,
                                                     steady_spec=steady)
    mask = jnp.asarray(roi_mask(spec))
    wins = [window(s) for s in (1, 2)]
    ev_b = stack_events([wins[0][0], wins[1][0]])
    frames = jnp.stack([wins[0][1], wins[1][1]])
    keys = jnp.stack([jax.random.PRNGKey(7), jax.random.PRNGKey(8)])

    flows, prev, _ = step_cold(ev_b, frames, mask, keys)
    jax.block_until_ready(flows)

    votes_fn = jax.jit(functools.partial(
        sharded_polarity_votes, spec=gen, mesh=mesh))

    @jax.jit
    def gate(nxt, old, carry_valid):
        return jax.tree_util.tree_map(
            lambda new, o: jnp.where(
                carry_valid.reshape((-1,) + (1,) * (new.ndim - 1)), new, o),
            nxt, old)

    cv = jnp.array([True, True])

    def timeit(fn, *args, n=5):
        out = fn(*args)  # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n

    t_votes = timeit(votes_fn, ev_b)
    t_gate = timeit(gate, prev, prev, cv)
    t_step = timeit(lambda: step_warm(ev_b, frames, mask, keys, prev, cv),
                    n=3)
    print(json.dumps({
        "shape": [h, w], "capacity": cap, "lanes": 2, "mesh": [2, 4],
        "steady_n_iter": steady.n_iter,
        "votes_psum_s": round(t_votes, 4),
        "carry_gate_s": round(t_gate, 5),
        "warm_step_s": round(t_step, 3),
        "votes_share": round(t_votes / t_step, 4),
        "carry_share": round(t_gate / t_step, 5),
    }))
    os._exit(0)  # axon-safe exit convention shared by the other probes


if __name__ == "__main__":
    main()
