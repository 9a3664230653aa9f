"""Event-stream noise filters: background activity, hot pixels, flicker.

TPU-native re-design of reference ``src/utils/event_filters.py``.  The
reference BAF walks events one-by-one in Python updating a per-pixel
latest-timestamp map (``event_filters.py:46-97``) — inherently sequential.
Here three implementations are offered:

  * :func:`background_activity_filter` — exact sequential semantics as a
    ``lax.scan`` (small batches / validation).
  * :func:`background_activity_filter_fast` — vectorized time-binned
    approximation that runs at full TPU throughput (support counted from
    events within the last ``dt``-to-``2dt``; equal to the exact filter for
    the vast majority of events).
  * the native C++ runtime (``event_based_bos_tpu.runtime``) provides the
    exact filter at host-memory speed for the data-loading path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import Events
from .events import crop_event
from .iwe import create_iwe

__all__ = [
    "background_activity_filter",
    "background_activity_filter_fast",
    "hot_pixel_filter",
    "flicker_filter",
    "EventFilter",
]


def background_activity_filter(
    ev: Events,
    image_shape: Tuple[int, int],
    dt: float,
    ksize: int = 1,
    num_support_event: int = 1,
    time_map: Optional[jax.Array] = None,
):
    """Exact Background Activity Filter (Delbrück 2008 semantics).

    For each event in stream order: write its timestamp into the per-pixel
    time map, then keep it iff the ``(num_support+1)``-th most recent
    timestamp in its ``(2k+1)²`` neighbourhood is within ``dt``
    (parity: ``continuous_background_activity_filter``,
    ``event_filters.py:46-97``).  Returns ``(filtered_events, time_map)``.
    """
    h, w = image_shape
    if time_map is None:
        time_map = jnp.zeros(image_shape, ev.t.dtype)
    else:
        time_map = time_map.astype(ev.t.dtype)
    k = int(ksize)
    win = 2 * k + 1

    def step(tmap, e):
        x, y, t, valid = e
        xi = jnp.clip(x.astype(jnp.int32), 0, h - 1)
        yi = jnp.clip(y.astype(jnp.int32), 0, w - 1)
        tmap = tmap.at[xi, yi].max(jnp.where(valid, t, -jnp.inf))
        # gather the neighbourhood (edge-clamped window like the reference's
        # min/max bounds; out-of-range cells duplicate edge values, which can
        # only make the filter marginally more permissive at borders)
        x0 = jnp.clip(xi - k, 0, h - win)
        y0 = jnp.clip(yi - k, 0, w - win)
        window = jax.lax.dynamic_slice(tmap, (x0, y0), (win, win)).reshape(-1)
        sorted_w = jnp.sort(window)
        last = sorted_w[-1 - num_support_event]
        keep = (t - last) < dt
        return tmap, keep & valid.astype(bool)

    es = jnp.stack([ev.x, ev.y, ev.t, ev.valid.astype(ev.t.dtype)], axis=-1)
    time_map, keeps = jax.lax.scan(step, time_map, es)
    return ev.mask_where(keeps), time_map


def background_activity_filter_fast(
    ev: Events,
    image_shape: Tuple[int, int],
    dt: float,
    ksize: int = 1,
    num_support_event: int = 1,
    max_bins: int = 64,
) -> Events:
    """Vectorized BAF approximation via time-binned occupancy maps.

    Events are bucketed into ``dt``-wide bins; an event is kept when at least
    ``num_support_event`` *other* pixels in its neighbourhood fired within
    its own or the previous bin (true support age ∈ [0, 2dt) instead of the
    exact [0, dt); in practice nearly identical keep decisions).  The work is
    one occupancy histogram + summed-area table per bin inside a
    ``lax.scan`` — full VPU throughput, no sequential per-event dependency.

    ``max_bins`` is the static bin capacity; events beyond
    ``tmin + max_bins·dt`` fall into the last bin.
    """
    h, w = image_shape
    k = int(ksize)
    tmin = jnp.min(jnp.where(ev.valid, ev.t, jnp.inf))
    bins = jnp.clip(jnp.floor((ev.t - tmin) / dt).astype(jnp.int32),
                    0, max_bins - 1)
    xi = jnp.clip(ev.x.astype(jnp.int32), 0, h - 1)
    yi = jnp.clip(ev.y.astype(jnp.int32), 0, w - 1)

    def sat_of(occ):
        return jnp.pad(jnp.cumsum(jnp.cumsum(occ, 0), 1), ((1, 0), (1, 0)))

    x0 = jnp.clip(xi - k, 0, h)
    x1 = jnp.clip(xi + k + 1, 0, h)
    y0 = jnp.clip(yi - k, 0, w)
    y1 = jnp.clip(yi + k + 1, 0, w)

    def per_bin(prev_occ, b):
        occ = jnp.zeros((h, w), jnp.int32)
        sel = ev.valid & (bins == b)
        occ = occ.at[xi, yi].add(jnp.where(sel, 1, 0), mode="drop")
        occ = (occ > 0).astype(jnp.int32)
        both = ((occ + prev_occ) > 0).astype(jnp.int32)
        sat = sat_of(both)
        cnt = sat[x1, y1] - sat[x0, y1] - sat[x1, y0] + sat[x0, y0]
        own = both[xi, yi]
        support_b = jnp.where(sel, cnt - own, 0)
        return occ, support_b

    _, supports = jax.lax.scan(per_bin, jnp.zeros((h, w), jnp.int32),
                               jnp.arange(max_bins))
    support = supports.sum(axis=0)
    return ev.mask_where(support >= num_support_event)


def hot_pixel_filter(
    ev: Events,
    image_shape: Tuple[int, int],
    hot_pixel: float = 10,
) -> Events:
    """Drop events on pixels whose vote count exceeds ``hot_pixel``.

    Parity: ``hot_pixel_filter`` (``event_filters.py:100-128``) — threshold
    on the bilinear IWE, membership test vectorized as a mask gather.
    """
    iwe = create_iwe(ev, image_shape, sigma=0)
    hot = iwe > hot_pixel
    xi = jnp.clip(ev.x.astype(jnp.int32), 0, image_shape[0] - 1)
    yi = jnp.clip(ev.y.astype(jnp.int32), 0, image_shape[1] - 1)
    return ev.mask_where(~hot[xi, yi])


def flicker_filter(ev: Events, dt: float = 0.01) -> Tuple[Events, Events]:
    """Split events into (linked, unlinked) by same-pixel polarity flips.

    Parity: ``flicker_filter`` (``event_filters.py:131-151``): two
    consecutive events at one pixel with opposite polarity closer than ``dt``
    are "linked" (flicker).  The reference's O(n²) loop becomes one lexsort.
    """
    big = jnp.asarray(jnp.inf, ev.t.dtype)
    pix_key = jnp.where(ev.valid, ev.x * 1e6 + ev.y, big)
    order = jnp.lexsort((ev.t, pix_key))
    inv = jnp.argsort(order)
    xs, ts, ps, vs = ev.x[order], ev.t[order], ev.p[order], ev.valid[order]
    pk = pix_key[order]
    same = (pk[1:] == pk[:-1]) & vs[1:] & vs[:-1]
    opposite = ps[1:] != ps[:-1]
    close = ts[:-1] > ts[1:] - dt
    pair = same & opposite & close
    linked_sorted = jnp.zeros_like(vs)
    linked_sorted = linked_sorted.at[:-1].max(pair)
    linked_sorted = linked_sorted.at[1:].max(pair)
    linked = linked_sorted[inv]
    return ev.mask_where(linked), ev.mask_where(~linked)


class EventFilter:
    """Configured preprocessing pipeline (CROP → BAF → HOT).

    Parity: ``EventFilter`` (``event_filters.py:154-224``): the filter list
    comes from the YAML ``solver.filter`` section; a CROP pass is prepended
    automatically when an ROI is configured; BAF may keep a continuous time
    map across batches.

    The ``exact_baf`` flag selects the sequential-parity scan (default the
    fast binned kernel).
    """

    def __init__(self, image_shape, filter_config, exact_baf: bool = False):
        self.image_shape = tuple(image_shape)
        self.params = filter_config.get("parameters", {})
        self.filters = list(filter_config.get("filters") or [])
        if "xmin" in self.params:
            self.filters = ["CROP"] + self.filters
        self.continuous_update = bool(self.params.get("BAF_continuous_update"))
        self.exact_baf = exact_baf
        self.time_map = None
        self.np_time_map = None

    def process_numpy(self, events):
        """Host-side pipeline over a raw ``(n, 4)`` array using the native
        C++ runtime (exact BAF/HOT at memory speed) — preferred before the
        device upload.  Returns the filtered ndarray."""
        import numpy as np

        from .. import runtime

        for name in self.filters:
            if len(events) < 10:
                return events
            if name == "CROP":
                m = ((events[:, 0] >= self.params["xmin"])
                     & (events[:, 0] < self.params["xmax"])
                     & (events[:, 1] >= self.params["ymin"])
                     & (events[:, 1] < self.params["ymax"]))
                events = events[m]
            elif name == "BAF":
                keep, tmap = runtime.baf_filter(
                    events, self.image_shape, self.params["BAF_dt"],
                    self.params.get("BAF_ksize", 1),
                    self.params.get("BAF_num_support_event", 1),
                    time_map=self.np_time_map)
                self.np_time_map = tmap if self.continuous_update else None
                events = events[keep]
            elif name == "HOT":
                keep = runtime.hot_pixel_filter(
                    events, self.image_shape,
                    self.params.get("HOT_thresh", 10))
                events = events[keep]
            else:
                raise KeyError(f"Unknown filter {name!r}")
        return events

    def process(self, ev: Events) -> Events:
        for name in self.filters:
            if int(ev.count()) < 10:
                return ev
            if name == "CROP":
                ev = crop_event(ev, self.params["xmin"], self.params["xmax"],
                                self.params["ymin"], self.params["ymax"])
            elif name == "BAF":
                if self.exact_baf:
                    ev, tmap = background_activity_filter(
                        ev, self.image_shape, self.params["BAF_dt"],
                        self.params.get("BAF_ksize", 1),
                        self.params.get("BAF_num_support_event", 1),
                        time_map=self.time_map)
                    self.time_map = tmap if self.continuous_update else None
                else:
                    ev = background_activity_filter_fast(
                        ev, self.image_shape, self.params["BAF_dt"],
                        self.params.get("BAF_ksize", 1),
                        self.params.get("BAF_num_support_event", 1))
            elif name == "HOT":
                ev = hot_pixel_filter(ev, self.image_shape,
                                      self.params.get("HOT_thresh", 10))
            else:
                raise KeyError(f"Unknown filter {name!r}")
        return ev
