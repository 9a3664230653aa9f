"""Batched multi-sequence evaluation and hyper-parameter sweeps.

The TPU replacement for running the reference script once per config /
sequence: independent problem instances (frames of different sequences,
learning rates, initialization seeds) become a vmapped batch axis, sharded
across chips over the mesh ``data`` axis — one compiled program evaluates the
whole sweep (BASELINE config #5).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.gradients import frame_gradients
from ..solver.generative import iwe_cache
from ..solver.pyramid import PyramidSpec, solve_pyramid
from ..types import Events

__all__ = ["hyperparam_sweep", "stack_events"]


def stack_events(event_batches) -> Events:
    """Stack equal-capacity :class:`Events` into a leading batch axis."""
    return Events(*(jnp.stack([getattr(e, f) for e in event_batches])
                    for f in Events._fields))


def hyperparam_sweep(
    ev: Events,
    frame: jax.Array,
    mask: jax.Array,
    lrs: jax.Array,
    keys: jax.Array,
    spec: PyramidSpec,
    mesh: Optional[jax.sharding.Mesh] = None,
):
    """Sweep (learning rate × init seed) for one frame in a single program.

    The IWE cache and frame gradients are computed once and broadcast; only
    the optimization trajectories differ.  Returns
    ``(flows [S, 2, H, W], final_losses [S])`` with the sweep axis sharded
    over the mesh ``data`` axis when a mesh is given.

    Args:
        lrs: ``[S]`` learning rates (traced through the optax schedule).
        keys: ``[S, 2]`` PRNG keys for the per-patch initializations.
    """
    gen = spec.gen

    def one(lr, key, hist, weights, weight_inverse, gx, gy):
        flow, aux = solve_pyramid(hist, weights, weight_inverse, gx, gy,
                                  mask, key, spec, lr=lr)
        return flow, aux["loss_history"][-1][-1]

    def sweep(ev, frame, lrs, keys):
        gx, gy = frame_gradients(frame.astype(gen.dtype),
                                 ksize=gen.sobel_ksize,
                                 use_log_intensity=gen.use_log_intensity)
        hist, weights, weight_inverse = iwe_cache(ev, gen)
        return jax.vmap(
            lambda lr, k: one(lr, k, hist, weights, weight_inverse, gx, gy)
        )(lrs, keys)

    if mesh is not None:
        data_sharding = NamedSharding(mesh, P("data"))
        lrs = jax.device_put(lrs, data_sharding)
        keys = jax.device_put(keys, data_sharding)
    return jax.jit(sweep)(ev, frame, lrs, keys)
