"""Event voxelization kernels (DSEC-style and EventGAN-style volumes).

TPU-native re-design of the voxel builders in reference
``src/utils/event_utils.py:291-440``, expressed as masked trilinear
scatter-adds over fixed-capacity event batches.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..types import Events

__all__ = ["create_event_voxel", "generate_discretized_event_volume"]


def create_event_voxel(
    ev: Events,
    voxel_shape: Tuple[int, int, int],
    normalize: bool = False,
) -> jax.Array:
    """Polarity-weighted trilinear voxel grid (DSEC representation).

    Parity: ``create_event_voxel`` (``event_utils.py:291-366``).  NOTE the
    reference follows the DSEC upstream convention here: within this voxel
    the first coordinate is the **width** direction.  This wrapper keeps the
    framework convention (``ev.x`` = row) and maps accordingly: voxel cell
    ``[c, ev.x, ev.y]``.  Polarity is expected in {−1, +1} and weights votes.

    Args:
        voxel_shape: (C, H, W).
    """
    c, h, w = voxel_shape
    tmin = jnp.min(jnp.where(ev.valid, ev.t, jnp.inf))
    tmax = jnp.max(jnp.where(ev.valid, ev.t, -jnp.inf))
    t_norm = (c - 1) * (ev.t - tmin) / jnp.maximum(tmax - tmin, 1e-30)

    x0 = jnp.floor(ev.y)  # width direction (DSEC "x")
    y0 = jnp.floor(ev.x)  # height direction
    t0 = jnp.floor(t_norm)
    value = ev.p

    grid = jnp.zeros((c * h * w,), jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dt_ in (0, 1):
                xl = x0 + dx
                yl = y0 + dy
                tl = t0 + dt_
                inb = ((xl >= 0) & (xl < w) & (yl >= 0) & (yl < h)
                       & (tl >= 0) & (tl < c) & ev.valid)
                wgt = (value
                       * (1 - jnp.abs(xl - ev.y))
                       * (1 - jnp.abs(yl - ev.x))
                       * (1 - jnp.abs(tl - t_norm)))
                idx = (h * w * tl + w * yl + xl).astype(jnp.int32)
                idx = jnp.where(inb, idx, 0)
                grid = grid.at[idx].add(jnp.where(inb, wgt, 0.0), mode="drop")
    grid = grid.reshape(voxel_shape)
    if normalize:
        nz = grid != 0
        cnt = jnp.maximum(nz.sum(), 1)
        mean = jnp.sum(grid * nz) / cnt
        var = jnp.sum((grid - mean) ** 2 * nz) / cnt
        std = jnp.sqrt(var)
        grid = jnp.where(nz, (grid - mean) / jnp.where(std > 0, std, 1.0), grid)
    return grid


def generate_discretized_event_volume(
    ev: Events, vol_size: Tuple[int, int, int]
) -> jax.Array:
    """Polarity-separated time-bilinear volume (EventGAN representation).

    Parity: ``generate_discretized_event_volume`` + helpers
    (``event_utils.py:370-440``): positive events fill bins
    ``[0, B/2)``, negative ``[B/2, B)``; timestamps are scaled to
    ``[0, B/2 − 1]`` and deposited with floor/ceil weights; the vote value is
    the fractional distance (``calc_floor_ceil_delta``).

    Args:
        vol_size: (B, H, W) with ``B`` even.
    """
    b, h, w = vol_size
    half = b // 2
    x = jnp.clip(ev.x.astype(jnp.int32), 0, h - 1)
    y = jnp.clip(ev.y.astype(jnp.int32), 0, w - 1)
    tmin = jnp.min(jnp.where(ev.valid, ev.t, jnp.inf))
    tmax = jnp.max(jnp.where(ev.valid, ev.t, -jnp.inf))
    t_scaled = (ev.t - tmin) * ((half - 1) / jnp.maximum(tmax - tmin, 1e-30))

    t_fl = jnp.floor(t_scaled + 1e-8)
    t_ce_fake = jnp.floor(t_scaled) + 1
    d_ce = t_scaled - t_fl
    d_fl = t_ce_fake - t_scaled
    t_ce = jnp.ceil(t_scaled - 1e-8)

    pol_off = jnp.where(ev.p < 0, half, 0)
    vol = jnp.zeros((b * h * w,), jnp.float32)
    for tt, dd in ((t_fl, d_fl), (t_ce, d_ce)):
        tb = tt.astype(jnp.int32) + pol_off
        inb = ev.valid & (tt >= 0) & (tt < half)
        idx = jnp.where(inb, (h * w) * tb + w * x + y, 0)
        vol = vol.at[idx].add(jnp.where(inb, dd, 0.0), mode="drop")
    return vol.reshape(vol_size)
