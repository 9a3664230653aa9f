"""Per-event warping under parametric motion models.

TPU-native re-design of reference ``src/warp.py``.  The reference wraps motion
models in a ``Warp`` class with numpy/torch dual paths
(``warp.py:55-383``); here each model is a pure function over the masked
:class:`~event_based_bos_tpu.types.Events` batch, composable with ``jax.grad``
/ ``vmap`` (the dense-flow gather is differentiable w.r.t. the flow field).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..types import Events
from .events import _masked_min_max

__all__ = [
    "calculate_reftime",
    "calculate_dt",
    "warp_event_2dof",
    "warp_event_dense_flow",
    "warp_event",
    "get_flow_from_motion",
    "motion_model_keys",
    "motion_model_to_motion",
    "motion_model_from_motion",
    "get_motion_vector_size",
]

MOTION_MODELS = ("dense-flow", "2d-translation", "rigid-optical-flow")

_DIRECTION_ALIAS = {"first": 0.0, "middle": 0.5, "last": 1.0, "before": -1.0, "after": 2.0}


def motion_model_keys(motion_model: str):
    """Parameter key names per motion model (``warp.py:95-112``)."""
    if motion_model in ("dense-flow", "2d-translation", "rigid-optical-flow"):
        return ["trans_x", "trans_y"]
    if motion_model == "scaler":
        return ["scaler"]
    raise KeyError(f"motion_model = {motion_model!r} not supported")


def motion_model_to_motion(motion_model: str, params: dict) -> jnp.ndarray:
    """Parameter dict → motion vector (``warp.py:126-145``)."""
    if motion_model in ("dense-flow", "2d-translation", "rigid-optical-flow"):
        return jnp.asarray([params["trans_x"], params["trans_y"]])
    if motion_model == "scaler":
        return jnp.asarray([params["scaler"]])
    raise KeyError(f"motion_model = {motion_model!r} not supported")


def motion_model_from_motion(motion, motion_model: str) -> dict:
    """Motion vector → parameter dict (``warp.py:147-165``)."""
    keys = motion_model_keys(motion_model)
    return {k: motion[i] for i, k in enumerate(keys)}


def get_motion_vector_size(motion_model: str) -> int:
    """DoF of the motion model (``warp.py:114-124``)."""
    return len(motion_model_keys(motion_model))


def calculate_reftime(
    ev: Events, direction: Union[str, float] = "first", key: Optional[jax.Array] = None
) -> jax.Array:
    """Reference timestamp for the warp.

    Float ``direction`` interpolates between min (0.0) and max (1.0) of the
    live timestamps; strings map as first/middle/last/before/after; "random"
    draws uniform in [0, 1] (requires ``key``).

    Parity: ``Warp.calculate_reftime`` (``warp.py:230-262``).
    """
    tmin, tmax = _masked_min_max(ev.t, ev.valid)
    if isinstance(direction, str):
        if direction == "random":
            if key is None:
                raise ValueError("direction='random' requires a PRNG key")
            frac = jax.random.uniform(key, tmin.shape, ev.t.dtype)
            return tmin + (tmax - tmin) * frac
        try:
            direction = _DIRECTION_ALIAS[direction]
        except KeyError:
            raise ValueError(
                f"direction should be first/middle/last/random/before/after or float, got {direction!r}"
            )
    return tmin + (tmax - tmin) * direction


def calculate_dt(
    ev: Events,
    reference_time: jax.Array,
    normalize_t: bool = False,
    time_period: Optional[jax.Array] = None,
) -> jax.Array:
    """``t - t_ref``, optionally normalized so the span is 1.

    Parity: ``Warp.calculate_dt`` (``warp.py:264-288``) — with ``normalize_t``
    and no explicit period the dt span (max-min over live events) is used.
    """
    dt = ev.t - jnp.asarray(reference_time)[..., None]
    if normalize_t:
        if time_period is None:
            dmin, dmax = _masked_min_max(dt, ev.valid)
            time_period = dmax - dmin
        dt = dt / jnp.asarray(time_period)[..., None]
    return dt


def warp_event_2dof(
    ev: Events,
    translation: jax.Array,
    reference_time: jax.Array,
    normalize_t: bool = False,
    time_period: Optional[jax.Array] = None,
) -> Events:
    """Warp under a constant 2-DoF translation.

    ``x' = x + dt * trans_x`` — the sign convention matches the reference
    (``warp.py:344-383``: "-1 (from translation pose into flow) * -1 (from
    warp, -dt) is plus").  Output carries ``t = dt``.
    """
    dt = calculate_dt(ev, reference_time, normalize_t, time_period)
    return ev._replace(x=ev.x + dt * translation[..., 0, None],
                       y=ev.y + dt * translation[..., 1, None],
                       t=dt)


def warp_event_dense_flow(
    ev: Events,
    flow: jax.Array,
    reference_time: jax.Array,
    normalize_t: bool = False,
    time_period: Optional[jax.Array] = None,
) -> Events:
    """Warp by a dense flow field sampled at the integer event pixel.

    ``x' = x - dt * flow[0, ix, iy]`` (nearest-pixel gather, like the
    reference's ``torch.gather`` path, ``warp.py:292-342``).  Differentiable
    w.r.t. ``flow``.

    Args:
        flow: ``[2, H, W]`` (row-velocity, col-velocity).
    """
    dt = calculate_dt(ev, reference_time, normalize_t, time_period)
    h, w = flow.shape[-2:]
    ix = jnp.clip(ev.x.astype(jnp.int32), 0, h - 1)
    iy = jnp.clip(ev.y.astype(jnp.int32), 0, w - 1)
    fx = flow[..., 0, :, :][..., ix, iy] if flow.ndim > 3 else flow[0, ix, iy]
    fy = flow[..., 1, :, :][..., ix, iy] if flow.ndim > 3 else flow[1, ix, iy]
    return ev._replace(x=ev.x - dt * fx, y=ev.y - dt * fy, t=dt)


def warp_event(
    ev: Events,
    motion: jax.Array,
    motion_model: str,
    direction: Union[str, float] = "first",
    normalize_t: bool = False,
    time_period: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
) -> Events:
    """Dispatch over motion models (``Warp.warp_event``, ``warp.py:193-228``)."""
    ref_time = calculate_reftime(ev, direction, key)
    if motion_model == "dense-flow":
        return warp_event_dense_flow(ev, motion, ref_time, normalize_t, time_period)
    if motion_model in ("2d-translation", "rigid-optical-flow"):
        return warp_event_2dof(ev, motion, ref_time, normalize_t, time_period)
    raise KeyError(f"motion_model = {motion_model!r} not supported")


def get_flow_from_motion(
    motion: jax.Array, motion_model: str, image_size: Tuple[int, int],
    normalize_t: bool = False,
) -> jax.Array:
    """Numerically densify a rigid motion into a ``[2, H, W]`` flow field.

    Mirrors the reference's trick of warping a unit-time synthetic event per
    pixel and reading off the displacement (``warp.py:167-190``, including the
    prepended t=0 anchor event that pins the reference time to 0).
    """
    h, w = image_size
    gx, gy = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    n = h * w
    x = jnp.concatenate([jnp.zeros((1,), jnp.float32), gx.reshape(-1)])
    y = jnp.concatenate([jnp.zeros((1,), jnp.float32), gy.reshape(-1)])
    t = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.ones((n,), jnp.float32)])
    p = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.ones((n,), jnp.float32)])
    ev = Events(x, y, t, p, jnp.ones((n + 1,), bool))
    warped = warp_event(ev, motion, motion_model, direction="first",
                        normalize_t=normalize_t)
    u = -(warped.x[1:] - x[1:]).reshape(h, w)
    v = -(warped.y[1:] - y[1:]).reshape(h, w)
    return jnp.stack([u, v], axis=0)
