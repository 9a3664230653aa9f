"""Event-batch operations (masking, generation, transforms).

TPU-native re-design of reference ``src/utils/event_utils.py``.  Every
filtering op (crop / remove / time filter / polarity split) is expressed as a
validity-mask update on a fixed-capacity :class:`~event_based_bos_tpu.types.Events`
batch so the shapes stay static under ``jax.jit`` — the reference instead
gathers into ragged arrays (``event_utils.py:109-153``), which would force a
recompile per window on TPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import Events, events_from_arrays

__all__ = [
    "generate_events",
    "crop_event",
    "remove_event",
    "filter_event_by_time",
    "search_exact_event",
    "shift_event",
    "random_sample_event",
    "set_event_origin_to_zero",
    "normalize_time",
    "reverse_event",
    "sort_event_by_timestamp",
    "split_polarity",
    "undistort_events",
    "time_period",
]


def generate_events(
    key: jax.Array,
    n_events: int,
    height: int,
    width: int,
    tmin: float = 0.0,
    tmax: float = 0.5,
    dtype=jnp.float32,
) -> Events:
    """Generate random synthetic events (uniform), sorted by timestamp.

    Parity: reference ``event_utils.generate_events`` (``event_utils.py:18-47``):
    integer pixel positions, uniform times sorted ascending, polarity in {0, 1}.
    """
    kx, ky, kt, kp = jax.random.split(key, 4)
    x = jax.random.randint(kx, (n_events,), 0, height).astype(dtype)
    y = jax.random.randint(ky, (n_events,), 0, width).astype(dtype)
    t = jnp.sort(jax.random.uniform(kt, (n_events,), dtype, tmin, tmax))
    p = jax.random.randint(kp, (n_events,), 0, 2).astype(dtype)
    return events_from_arrays(x, y, t, p, dtype=dtype)


def crop_event(ev: Events, x0, x1, y0, y1) -> Events:
    """Keep events with ``x0 <= x < x1`` and ``y0 <= y < y1`` (mask update).

    Parity: ``event_utils.crop_event`` (``event_utils.py:109-129``).
    """
    keep = (ev.x >= x0) & (ev.x < x1) & (ev.y >= y0) & (ev.y < y1)
    return ev.mask_where(keep)


def remove_event(ev: Events, x0, x1, y0, y1) -> Events:
    """Drop events inside the window (complement of :func:`crop_event`).

    Parity: ``event_utils.remove_event`` (``event_utils.py:133-153``).
    """
    inside = (ev.x >= x0) & (ev.x < x1) & (ev.y >= y0) & (ev.y < y1)
    return ev.mask_where(~inside)


def filter_event_by_time(
    ev: Events, start_time: Optional[float] = None, end_time: Optional[float] = None
) -> Events:
    """Keep events with ``start_time <= t < end_time``.

    The reference uses ``searchsorted`` over time-sorted events
    (``event_utils.py:83-106``); with masks a range test is equivalent and
    order-independent.
    """
    keep = ev.valid
    if start_time is not None:
        keep = keep & (ev.t >= start_time)
    if end_time is not None:
        keep = keep & (ev.t < end_time)
    return ev._replace(valid=keep)


def search_exact_event(ev: Events, x, y) -> Events:
    """Keep events at exactly pixel ``(x, y)`` (``event_utils.py:156-169``)."""
    return ev.mask_where((ev.x == x) & (ev.y == y))


def shift_event(ev: Events, x0, y0) -> Events:
    """Translate event coordinates (``event_utils.py:172-183``)."""
    return ev._replace(x=ev.x + x0, y=ev.y + y0)


def random_sample_event(key: jax.Array, ev: Events, percentage: float) -> Events:
    """Randomly keep ``percentage`` % of the live events (mask thinning).

    Parity: ``event_utils.random_sample_event`` (``event_utils.py:186-201``);
    here implemented as an i.i.d. Bernoulli mask, which preserves static shape.
    """
    keep = jax.random.uniform(key, ev.valid.shape) < (percentage / 100.0)
    return ev.mask_where(keep)


def set_event_origin_to_zero(ev: Events, x0, y0, t0=0.0) -> Events:
    """Subtract per-field origins (``event_utils.py:204-219``)."""
    return ev._replace(x=ev.x - x0, y=ev.y - y0, t=ev.t - t0)


def _masked_min_max(v: jax.Array, valid: jax.Array) -> Tuple[jax.Array, jax.Array]:
    big = jnp.asarray(jnp.inf, v.dtype)
    vmin = jnp.min(jnp.where(valid, v, big), axis=-1)
    vmax = jnp.max(jnp.where(valid, v, -big), axis=-1)
    return vmin, vmax


def time_period(ev: Events) -> jax.Array:
    """``t.max() - t.min()`` over live events."""
    tmin, tmax = _masked_min_max(ev.t, ev.valid)
    return tmax - tmin


def normalize_time(ev: Events) -> Tuple[Events, jax.Array]:
    """Normalize live timestamps to [0, 1]; returns (events, time_scale).

    Parity: ``event_utils.normalize_time`` (``event_utils.py:222-239``).
    """
    tmin, tmax = _masked_min_max(ev.t, ev.valid)
    scale = tmax - tmin
    t = (ev.t - tmin[..., None]) / scale[..., None]
    return ev._replace(t=t), scale


def reverse_event(ev: Events) -> Events:
    """Reverse time and negate polarity (``event_utils.py:51-68``)."""
    tmin, tmax = _masked_min_max(ev.t, ev.valid)
    t = jnp.abs(tmax[..., None] - ev.t) + tmin[..., None]
    return ev._replace(t=t, p=-ev.p)


def sort_event_by_timestamp(ev: Events) -> Events:
    """Sort by timestamp; invalid slots sink to the end.

    Parity: ``event_utils.sort_event_by_timestamp`` (``event_utils.py:71-80``).
    """
    key = jnp.where(ev.valid, ev.t, jnp.inf)
    order = jnp.argsort(key, axis=-1)
    take = lambda a: jnp.take_along_axis(a, order, axis=-1)
    return Events(take(ev.x), take(ev.y), take(ev.t), take(ev.p), take(ev.valid))


def split_polarity(ev: Events) -> Tuple[Events, Events]:
    """Return (positive, negative) event batches via masks.

    Parity: ``event_utils.split_polarity`` (``event_utils.py:269-287``);
    positive means ``p > 0``.
    """
    pos = ev.p > 0
    return ev.mask_where(pos), ev.mask_where(~pos)


def undistort_events(ev: Events, map_x: jax.Array, map_y: jax.Array, h: int, w: int) -> Events:
    """Rectify event coordinates through integer lookup maps.

    Parity: ``event_utils.undistort_events`` (``event_utils.py:242-266``):
    new row = ``map_y[x, y]``, new col = ``map_x[x, y]``; out-of-frame events
    are dropped (mask).
    """
    xi = jnp.clip(ev.x.astype(jnp.int32), 0, map_y.shape[0] - 1)
    yi = jnp.clip(ev.y.astype(jnp.int32), 0, map_y.shape[1] - 1)
    k = map_y[xi, yi].astype(ev.x.dtype)
    l = map_x[xi, yi].astype(ev.y.dtype)
    keep = (k >= 0) & (k < h) & (l >= 0) & (l < w)
    return ev._replace(x=k, y=l).mask_where(keep)
