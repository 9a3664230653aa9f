"""Sharded pipeline stages: event-axis IWE reduction + data-parallel solves.

This is the TPU replacement for the (absent) distributed layer of the
reference (SURVEY §5): events are sharded over the ``event`` mesh axis, each
chip scatters its shard into a partial polarity-vote image, partial images
are ``psum``-reduced over ICI, and the per-frame pyramid optimizations run
data-parallel over the ``data`` axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.sharding import NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # jax ≥ 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..solver.generative import (
    GenerativeSpec,
    iwe_cache_from_votes,
    polarity_votes,
)
from ..solver.pyramid import PyramidSpec, solve_pyramid
from ..ops.gradients import frame_gradients
from ..types import Events

__all__ = ["sharded_polarity_votes", "make_multichip_estimator",
           "make_multichip_multistart", "make_multichip_sequential"]


def sharded_polarity_votes(ev: Events, spec: GenerativeSpec,
                           mesh: jax.sharding.Mesh,
                           event_axis: str = "event",
                           data_axis: Optional[str] = "data") -> jax.Array:
    """Polarity vote images with the event axis sharded across chips.

    ``ev`` fields are ``[B, N]``; each chip votes its local ``N/e`` slice
    into a private ``[2, H, W]`` image, then the partial images are summed
    with ``psum`` over the ``event`` axis — the collective rides ICI.
    Returns ``[B, 2, H, W]`` replicated over ``event``.
    """
    in_spec = P(data_axis, event_axis)
    out_spec = P(data_axis, None, None, None)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(in_spec,) * 5, out_specs=out_spec)
    def _votes(x, y, t, p, valid):
        local = Events(x, y, t, p, valid)
        pol = jax.vmap(lambda e: polarity_votes(e, spec))(local)
        return jax.lax.psum(pol, event_axis)

    return _votes(ev.x, ev.y, ev.t, ev.p, ev.valid)


def make_multichip_multistart(spec: PyramidSpec, mesh: jax.sharding.Mesh,
                              fetch_dtype=None):
    """Multi-start pyramid solve with the restarts sharded across chips.

    The embarrassingly-parallel case ``docs/performance.md`` promises: on
    ONE chip, ``n_restarts: R`` costs ~R× a single solve with sequential
    ``lax.map`` lanes (19× with batched ``vmap`` lanes — see
    ``PyramidSpec.restart_mode``); across the mesh ``data`` axis each chip
    runs R/D restart lanes concurrently instead.  Here the lanes must stay
    a vmapped batch — the ``data``-axis sharding constraint is what spreads
    them over devices.  The IWE votes
    are reduced over the ``event`` axis once and replicated; only the PRNG
    keys (and therefore the random poisson-base inits, ``gml:425-450``)
    differ between lanes.  Best-restart selection matches the single-chip
    branch of :func:`..solver.pyramid.estimate_frame` exactly: lowest
    min-loss (``track_best``) else lowest final loss of the finest scale.

    The returned step shares the batched-step calling convention of
    :func:`make_multichip_estimator` with B = 1 — ``step(ev [1, N],
    frames [1, H, W], mask, keys [1]) -> (flow [1, 2, H, W],
    per-scale histories [1, n_iter_s] of the winning restart)`` — so the
    CLI's mesh loop drives either interchangeably.
    """
    import dataclasses

    gen = spec.gen
    R = spec.n_restarts
    if R < 2:
        raise ValueError("make_multichip_multistart needs n_restarts > 1")
    if spec.record_evolution > 0:
        # same policy as make_multichip_estimator: the batched step has no
        # consumer for per-iterate histories — R device lanes of them would
        # be silent memory/compute waste
        import logging

        logging.getLogger(__name__).warning(
            "record_evolution is not supported by the mesh multi-start "
            "step; disabling recording for this estimator.")
        spec = dataclasses.replace(spec, record_evolution=0)
    data_size = mesh.shape["data"]
    if R % data_size:
        raise ValueError(
            f"n_restarts ({R}) must be divisible by the mesh data axis "
            f"({data_size}) to shard the restart lanes evenly")

    def step(ev: Events, frames: jax.Array, mask: jax.Array,
             keys: jax.Array):
        import jax.numpy as jnp

        pol = sharded_polarity_votes(ev, gen, mesh, data_axis=None)[0]
        hist, weights, weight_inverse = iwe_cache_from_votes(pol, gen)
        gx, gy = frame_gradients(frames[0].astype(gen.dtype),
                                 ksize=gen.sobel_ksize,
                                 use_log_intensity=gen.use_log_intensity)
        ks = jax.random.split(keys[0], R)
        ks = jax.lax.with_sharding_constraint(
            ks, NamedSharding(mesh, P("data")))
        flows, auxes = jax.vmap(
            lambda k: solve_pyramid(hist, weights, weight_inverse, gx, gy,
                                    mask, k, spec)
        )(ks)
        flows = jax.lax.with_sharding_constraint(
            flows, NamedSharding(mesh, P("data")))
        final_hist = auxes["loss_history"][-1]  # [R, finest n_iter]
        score = (jnp.min(final_hist, axis=-1) if spec.track_best
                 else final_hist[:, -1])
        best = jnp.argmin(score)
        flow = flows[best][None]
        if fetch_dtype is not None:
            # serving-path `flow_fetch_dtype`: cast inside the program so
            # the device→host fetch moves the reduced-precision bytes
            flow = flow.astype(fetch_dtype)
        hists = tuple(h[best][None] for h in auxes["loss_history"])
        return flow, hists

    return jax.jit(step)


def make_multichip_estimator(spec: PyramidSpec, mesh: jax.sharding.Mesh,
                             donate: bool = False, fetch_dtype=None):
    """Build the jitted multi-chip step for a batch of frames.

    Layout: events ``[B, N]`` sharded ``(data, event)``; frames ``[B, H, W]``
    and keys sharded ``(data,)``; the ROI mask is replicated.  The IWE
    reduction runs under ``shard_map`` (explicit ``psum``); the batched
    pyramid solve is expressed with sharding constraints and partitioned by
    XLA (pure data parallelism over ``data``).

    Returns ``step(ev, frames, mask, keys) ->
    (flows [B, 2, H, W], loss_histories)`` where ``loss_histories`` is a
    tuple of per-scale ``[B, n_iter_s]`` arrays (coarsest → finest) — the
    same per-scale histories the single-chip solve reports.
    """
    import dataclasses

    gen = spec.gen
    if spec.record_evolution > 0:
        # per-iterate parameter recording would allocate B lanes of history
        # on device and no consumer exists in the batched path — drop it
        # loudly rather than silently paying for it
        import logging

        logging.getLogger(__name__).warning(
            "record_evolution is not supported by the multi-chip batched "
            "step — evolution videos are only produced by the single-chip "
            "loop; disabling recording for this estimator.")
        spec = dataclasses.replace(spec, record_evolution=0)

    def step(ev: Events, frames: jax.Array, mask: jax.Array, keys: jax.Array):
        pol = sharded_polarity_votes(ev, gen, mesh)
        pol = jax.lax.with_sharding_constraint(
            pol, NamedSharding(mesh, P("data")))

        def solve_one(pol_i, frame_i, key_i):
            hist, weights, weight_inverse = iwe_cache_from_votes(pol_i, gen)
            gx, gy = frame_gradients(frame_i.astype(gen.dtype),
                                     ksize=gen.sobel_ksize,
                                     use_log_intensity=gen.use_log_intensity)
            flow, aux = solve_pyramid(hist, weights, weight_inverse, gx, gy,
                                      mask, key_i, spec)
            return flow, tuple(aux["loss_history"])

        flows, losses = jax.vmap(solve_one)(pol, frames, keys)
        flows = jax.lax.with_sharding_constraint(
            flows, NamedSharding(mesh, P("data")))
        if fetch_dtype is not None:
            # serving-path `flow_fetch_dtype` (see SolverBase): halves the
            # fetched bytes; host side converts back to float32
            flows = flows.astype(fetch_dtype)
        return flows, losses

    return jax.jit(step)


def make_multichip_sequential(spec: PyramidSpec, mesh: jax.sharding.Mesh,
                              steady_spec: Optional[PyramidSpec] = None,
                              fetch_dtype=None):
    """Data-parallel *warm-started sequences*: D segments advance in lockstep.

    The warm-start chain (``patch_eklt_pyramid2.py:234-251`` semantics, the
    mechanism :func:`..solver.pyramid.solve_pyramid` implements via
    ``prev_params``) is inherently sequential, so plain mesh frame batching
    rejects it.  This step scales it out the other way: split the frame
    range into D contiguous segments, and each device-lane runs its own
    warm-started sequence — step *t* solves frame *t* of every segment,
    with the coarse-from-fine feedback carried per lane *inside* the jitted
    program (no per-frame host round-trip for the params).

    Returns ``(step_cold, step_warm)``:

    * ``step_cold(ev [D, N], frames [D, H, W], mask, keys [D]) ->
      (flows, prev, losses)`` — every lane cold-starts at the full
      schedule (used for step 0 / chain resets).
    * ``step_warm(ev, frames, mask, keys, prev, carry_valid [D]) ->
      (flows, prev', losses)`` — lanes run ``steady_spec`` (or ``spec``)
      warm-started from ``prev``; where ``carry_valid`` is False the lane's
      output feedback is discarded and its incoming ``prev`` carried
      through unchanged (dummy frames padding an exhausted / collapsed
      lane must not poison the chain).

    ``prev`` is the coarse-from-fine parameter pytree with a leading lane
    axis (list over scales of ``[D, dim, gh, gw]``).
    """
    import dataclasses

    import jax.numpy as jnp

    from ..solver.pyramid import update_coarse_from_fine

    gen = spec.gen
    if spec.n_restarts > 1:
        raise ValueError("sequential mesh mode is warm-start based; "
                         "n_restarts > 1 is a cold-start feature "
                         "(see the facade's warm_start validation)")
    specs = {}
    for name, s in (("cold", spec), ("warm", steady_spec or spec)):
        if s.record_evolution > 0:
            import logging

            logging.getLogger(__name__).warning(
                "record_evolution is not supported by the mesh sequential "
                "step; disabling recording for this estimator.")
            s = dataclasses.replace(s, record_evolution=0)
        specs[name] = s

    def _solve_lanes(ev, frames, mask, keys, s, prev=None):
        pol = sharded_polarity_votes(ev, gen, mesh)
        pol = jax.lax.with_sharding_constraint(
            pol, NamedSharding(mesh, P("data")))

        def solve_one(pol_i, frame_i, key_i, prev_i):
            hist, weights, weight_inverse = iwe_cache_from_votes(pol_i, gen)
            gx, gy = frame_gradients(frame_i.astype(gen.dtype),
                                     ksize=gen.sobel_ksize,
                                     use_log_intensity=gen.use_log_intensity)
            flow, aux = solve_pyramid(hist, weights, weight_inverse, gx, gy,
                                      mask, key_i, s, prev_params=prev_i)
            nxt = update_coarse_from_fine(aux["params_per_scale"], s)
            return flow, nxt, tuple(aux["loss_history"])

        if prev is None:
            flows, nxt, losses = jax.vmap(
                lambda p, f, k: solve_one(p, f, k, None))(pol, frames, keys)
        else:
            flows, nxt, losses = jax.vmap(solve_one)(pol, frames, keys, prev)
        flows = jax.lax.with_sharding_constraint(
            flows, NamedSharding(mesh, P("data")))
        if fetch_dtype is not None:
            flows = flows.astype(fetch_dtype)
        return flows, nxt, losses

    def step_cold(ev: Events, frames: jax.Array, mask: jax.Array,
                  keys: jax.Array):
        return _solve_lanes(ev, frames, mask, keys, specs["cold"])

    def step_warm(ev: Events, frames: jax.Array, mask: jax.Array,
                  keys: jax.Array, prev, carry_valid: jax.Array):
        flows, nxt, losses = _solve_lanes(ev, frames, mask, keys,
                                          specs["warm"], prev=prev)
        # exhausted / collapsed lanes keep their incoming params: the dummy
        # solve's feedback must not enter the chain
        keep = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                carry_valid.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
            nxt, prev)
        return flows, keep, losses

    return jax.jit(step_cold), jax.jit(step_warm)
