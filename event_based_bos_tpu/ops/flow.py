"""Optical-flow utilities: generation, time-aware voxelization, metrics.

TPU-native re-design of reference ``src/utils/flow_utils.py``.  The PDE
propagation schemes (1st-order upwind, inviscid Burgers) are stencil updates
that XLA fuses into a handful of elementwise ops; the time-voxel construction
is a ``lax.scan`` over bins instead of the reference's Python loop
(``flow_utils.py:97-224``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "generate_dense_optical_flow",
    "generate_uniform_optical_flow",
    "convert_flow_per_bin_to_flow_per_sec",
    "truncate_voxel_flow",
    "upwind_step",
    "burgers_step",
    "propagate_flow_bilinear",
    "propagate_flow_max",
    "propagate_flow_griddata",
    "construct_dense_flow_voxel",
    "calculate_flow_error",
    "estimate_corresponding_gt_flow",
]


def generate_dense_optical_flow(key: jax.Array, image_size: Tuple[int, int],
                                max_val: float = 30.0) -> jax.Array:
    """Random flow field ``[2, H, W]`` (``flow_utils.py:20-30``)."""
    return jax.random.uniform(key, (2,) + tuple(image_size), jnp.float32,
                              -max_val, max_val)


def generate_uniform_optical_flow(image_size: Tuple[int, int], x: float = 30.0,
                                  y: float = 30.0) -> jax.Array:
    """Constant flow field (``flow_utils.py:33-45``)."""
    return jnp.broadcast_to(jnp.array([x, y], jnp.float32)[:, None, None],
                            (2,) + tuple(image_size))


def convert_flow_per_bin_to_flow_per_sec(flow_per_bin: jax.Array,
                                         time_scale: jax.Array,
                                         n_bin: int) -> jax.Array:
    """(``flow_utils.py:49-64``)."""
    return flow_per_bin / time_scale[..., None, None]


def truncate_voxel_flow(flow_voxel: jax.Array, scheme: str = "mean") -> jax.Array:
    """Collapse a ``[bins, 2, H, W]`` voxel to ``[2, H, W]``
    (``flow_utils.py:68-93``: mean over bins with nonzero magnitude)."""
    if scheme != "mean":
        raise NotImplementedError(f"Scheme {scheme} is not implemented")
    mag = jnp.linalg.norm(flow_voxel, axis=1, keepdims=True)
    nz = mag > 0.0
    return (flow_voxel * nz).sum(axis=0) / (nz.sum(axis=0) + 1e-6)


def _diff_pads(a: jax.Array, axis: int):
    """(back, forward) one-sided differences with zero boundary."""
    d = jnp.diff(a, axis=axis)
    pad_back = [(0, 0)] * a.ndim
    pad_forw = [(0, 0)] * a.ndim
    pad_back[axis] = (1, 0)
    pad_forw[axis] = (0, 1)
    return jnp.pad(d, pad_back), jnp.pad(d, pad_forw)


def upwind_step(flow: jax.Array, dt: float, dx: float = 1.0, dy: float = 1.0
                ) -> jax.Array:
    """One 1st-order upwind advection step of the flow by itself.

    Parity: ``upwind_flow_to_voxel_numpy/torch`` (``flow_utils.py:447-556``):
    negative ``dt`` propagates backward by advecting the sign-flipped field.

    Args:
        flow: ``[(b,) 2, H, W]``.
    """
    squeeze = flow.ndim == 3
    if squeeze:
        flow = flow[None]
    dt_sign = jnp.sign(dt) if isinstance(dt, jax.Array) else (1.0 if dt >= 0 else -1.0)
    dt_abs = jnp.abs(dt) if isinstance(dt, jax.Array) else abs(dt)
    f = flow * dt_sign

    u = f[:, 0:1]
    v = f[:, 1:2]
    u_dx_b, u_dx_f = _diff_pads(u, -2)
    u_dy_b, u_dy_f = _diff_pads(u, -1)
    v_dx_b, v_dx_f = _diff_pads(v, -2)
    v_dy_b, v_dy_f = _diff_pads(v, -1)

    out = f - dt_abs * (
        jnp.maximum(u, 0) * jnp.concatenate([u_dx_b / dx, v_dx_b / dy], axis=1)
        + jnp.minimum(u, 0) * jnp.concatenate([u_dx_f / dx, v_dx_f / dy], axis=1)
        + jnp.maximum(v, 0) * jnp.concatenate([u_dy_b / dx, v_dy_b / dy], axis=1)
        + jnp.minimum(v, 0) * jnp.concatenate([u_dy_f / dx, v_dy_f / dy], axis=1)
    )
    out = out * dt_sign
    return out[0] if squeeze else out


def burgers_step(flow: jax.Array, dt: float, dx: float = 1.0, dy: float = 1.0
                 ) -> jax.Array:
    """One inviscid-Burgers advection step.

    Parity: ``inviscid_burger_flow_to_voxel_numpy/torch``
    (``flow_utils.py:559-702``): conservative flux form for the self-advection
    terms (replicate-padded neighbours), upwind for the cross terms.
    """
    squeeze = flow.ndim == 3
    if squeeze:
        flow = flow[None]
    dt_sign = jnp.sign(dt) if isinstance(dt, jax.Array) else (1.0 if dt >= 0 else -1.0)
    dt_abs = jnp.abs(dt) if isinstance(dt, jax.Array) else abs(dt)
    f = flow * dt_sign

    u = f[:, 0:1]
    v = f[:, 1:2]
    pow_flow = f**2 * jnp.sign(f)
    u_forw = jnp.pad(u, [(0, 0), (0, 0), (0, 1), (0, 0)], mode="edge")[..., 1:, :]
    u_back = jnp.pad(u, [(0, 0), (0, 0), (1, 0), (0, 0)], mode="edge")[..., :-1, :]
    v_forw = jnp.pad(v, [(0, 0), (0, 0), (0, 0), (0, 1)], mode="edge")[..., 1:]
    v_back = jnp.pad(v, [(0, 0), (0, 0), (0, 0), (1, 0)], mode="edge")[..., :-1]

    flow_back = jnp.concatenate([u_back, v_back], axis=1)
    flow_forw = jnp.concatenate([u_forw, v_forw], axis=1)
    d_back = jnp.concatenate([-u_back * u_back, -v_back * v_back], axis=1)
    d_forw = jnp.concatenate([u_forw * u_forw, v_forw * v_forw], axis=1)
    burgers_factor = (
        pow_flow
        + jnp.maximum(jnp.sign(flow_back), 0) * d_back
        - jnp.minimum(jnp.sign(flow_forw), 0) * d_forw
    ) / 2.0

    u_dy_b, u_dy_f = _diff_pads(u, -1)
    v_dx_b, v_dx_f = _diff_pads(v, -2)
    zeros = jnp.zeros_like(u)
    out = f - dt_abs * (
        jnp.maximum(u, 0) * jnp.concatenate([zeros, v_dx_b / dy], axis=1)
        + jnp.minimum(u, 0) * jnp.concatenate([zeros, v_dx_f / dy], axis=1)
        + jnp.maximum(v, 0) * jnp.concatenate([u_dy_b / dx, zeros], axis=1)
        + jnp.minimum(v, 0) * jnp.concatenate([u_dy_f / dx, zeros], axis=1)
        + burgers_factor
    )
    out = out * dt_sign
    return out[0] if squeeze else out


def propagate_flow_bilinear(flow_0: jax.Array, dt: float) -> jax.Array:
    """Push flow vectors forward by ``dt`` with bilinear-vote scatter.

    Parity: ``propagate_flow_to_voxel_*`` method "bilinear"
    (``flow_utils.py:227-314``).  NOTE: the reference pairs the fractional
    weights with *transposed* corners here — the (row+1, col) corner gets the
    column-fraction weight and vice versa (``flow_utils.py:259-283``), unlike
    its own IWE bilinear vote.  Replicated verbatim for parity.
    """
    _, h, w = flow_0.shape
    gx, gy = jnp.meshgrid(jnp.arange(h, dtype=flow_0.dtype),
                          jnp.arange(w, dtype=flow_0.dtype), indexing="ij")
    tx = (flow_0[0] * dt + gx).reshape(-1)
    ty = (flow_0[1] * dt + gy).reshape(-1)
    x1 = jnp.floor(tx + 1e-8)
    y1 = jnp.floor(ty + 1e-8)
    fx = tx - x1
    fy = ty - y1
    vals = flow_0.reshape(2, -1)
    out = jnp.zeros((2, h * w), flow_0.dtype)
    for ddx, ddy, wgt in ((0, 0, (1 - fx) * (1 - fy)), (0, 1, fx * (1 - fy)),
                          (1, 0, (1 - fx) * fy), (1, 1, fx * fy)):
        xi = x1 + ddx
        yi = y1 + ddy
        inb = (xi >= 0) & (xi < h) & (yi >= 0) & (yi < w)
        idx = jnp.where(inb, (xi * w + yi).astype(jnp.int32), 0)
        out = out.at[0, idx].add(jnp.where(inb, wgt * vals[0], 0.0), mode="drop")
        out = out.at[1, idx].add(jnp.where(inb, wgt * vals[1], 0.0), mode="drop")
    return out.reshape(2, h, w)


def propagate_flow_max(flow_0: jax.Array, dt: float) -> jax.Array:
    """Push flow vectors forward keeping the max-|flow| vote per pixel.

    Parity: method "max" (``flow_utils.py:297-325``, torch_scatter.scatter_max
    over |u|+|v|) — re-expressed as an argmax-by-magnitude scatter.
    """
    _, h, w = flow_0.shape
    gx, gy = jnp.meshgrid(jnp.arange(h, dtype=flow_0.dtype),
                          jnp.arange(w, dtype=flow_0.dtype), indexing="ij")
    tx = (flow_0[0] * dt + gx).reshape(-1)
    ty = (flow_0[1] * dt + gy).reshape(-1)
    x1 = jnp.floor(tx + 1e-8)
    y1 = jnp.floor(ty + 1e-8)
    vals = flow_0.reshape(2, -1)
    mag = jnp.abs(vals[0]) + jnp.abs(vals[1])
    best_mag = jnp.zeros((h * w,), flow_0.dtype)
    # first pass: max magnitude per destination cell over the 4 corners
    idxs = []
    for ddx, ddy in ((0, 0), (0, 1), (1, 0), (1, 1)):
        xi = x1 + ddx
        yi = y1 + ddy
        inb = (xi >= 0) & (xi < h) & (yi >= 0) & (yi < w)
        idx = jnp.where(inb, (xi * w + yi).astype(jnp.int32), h * w)
        idxs.append(idx)
        best_mag = best_mag.at[idx].max(jnp.where(inb, mag, -jnp.inf), mode="drop")
    # second pass: keep the winning vector
    out = jnp.zeros((2, h * w), flow_0.dtype)
    for idx in idxs:
        win = mag >= best_mag[jnp.clip(idx, 0, h * w - 1)]
        keep = win & (idx < h * w)
        out = out.at[0, idx].max(jnp.where(keep, vals[0], -jnp.inf), mode="drop")
        out = out.at[1, idx].max(jnp.where(keep, vals[1], -jnp.inf), mode="drop")
    return jnp.where(jnp.isfinite(out), out, 0.0).reshape(2, h, w)


def propagate_flow_griddata(flow_0, dt: float, method: str = "nearest"):
    """Scattered-data re-interpolation propagation (nearest/linear/cubic).

    Parity: ``propagate_flow_to_voxel_numpy`` methods "nearest"/"linear"/
    "cubic" (``flow_utils.py:327-341``): each source pixel is advected to
    ``x + dt·flow`` and the flow is re-sampled on the regular grid with
    ``scipy.interpolate.griddata``.  Host-side ground-truth tooling (numpy in,
    numpy out, NOT jittable) — like the reference, "linear"/"cubic" leave NaN
    outside the convex hull of the advected points.
    """
    import numpy as np
    import scipy.interpolate

    flow_0 = np.asarray(flow_0)
    _, h, w = flow_0.shape
    xx, yy = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    src = np.stack([
        (flow_0[0] * dt + xx).ravel(),
        (flow_0[1] * dt + yy).ravel(),
    ], axis=-1)
    dest = np.stack([xx.ravel(), yy.ravel()], axis=-1)
    flat = flow_0.reshape(2, -1)
    out = np.stack([
        scipy.interpolate.griddata(src, flat[0], dest, method=method),
        scipy.interpolate.griddata(src, flat[1], dest, method=method),
    ])
    return out.reshape(2, h, w)


def construct_dense_flow_voxel(
    dense_flow: jax.Array,
    time_bin: int,
    scheme: str = "upwind",
    t0_location: str = "middle",
    clamp: Optional[float] = None,
) -> jax.Array:
    """Time-aware flow voxel ``[bins, 2, H, W]`` from flow at t0.

    Parity: ``construct_dense_flow_voxel_numpy/torch``
    (``flow_utils.py:97-224``) with the bin loops as ``lax.scan``.
    Supported schemes: upwind / burgers (PDE), bilinear / max / same
    (vote propagation), zero, and the host-side griddata family
    nearest / linear / cubic (``flow_utils.py:327-341``; these run on host
    via scipy and are not jittable — GT tooling only).
    """
    if t0_location not in ("first", "middle"):
        raise NotImplementedError(f"t0_location = {t0_location} not supported")
    squeeze = dense_flow.ndim == 3
    if squeeze:
        dense_flow = dense_flow[None]
    b = dense_flow.shape[0]
    t0 = 0 if t0_location == "first" else time_bin // 2

    if scheme in ("upwind", "burgers"):
        step = upwind_step if scheme == "upwind" else burgers_step
        dt = 1.0 / time_bin

        def fwd(carry, _):
            nxt = step(carry, dt)
            return nxt, nxt

        def bwd(carry, _):
            nxt = step(carry, -dt)
            return nxt, nxt

        _, fwd_bins = jax.lax.scan(fwd, dense_flow, None, length=time_bin - 1 - t0)
        _, bwd_bins = jax.lax.scan(bwd, dense_flow, None, length=t0)
        voxel = jnp.concatenate(
            [bwd_bins[::-1], dense_flow[None], fwd_bins], axis=0)
        voxel = jnp.moveaxis(voxel, 0, 1)  # [b, bins, 2, H, W]
    else:
        if t0_location == "first":
            ts = jnp.arange(time_bin) / time_bin
        else:
            ts = (jnp.arange(time_bin) - time_bin // 2) / time_bin

        def one(dt):
            if scheme == "bilinear":
                return jax.vmap(lambda f: propagate_flow_bilinear(f, dt))(dense_flow)
            if scheme == "max":
                return jax.vmap(lambda f: propagate_flow_max(f, dt))(dense_flow)
            if scheme == "same":
                return dense_flow
            if scheme == "zero":
                return jnp.zeros_like(dense_flow)
            if scheme in ("nearest", "linear", "cubic"):
                import numpy as np

                host = np.stack([
                    propagate_flow_griddata(f, dt, scheme)
                    for f in np.asarray(dense_flow)
                ])
                return jnp.asarray(host, dense_flow.dtype)
            raise NotImplementedError(f"method = {scheme!r} is not supported.")

        voxel = jnp.stack([one(float(dt)) for dt in ts], axis=1)

    if clamp is not None:
        voxel = jnp.clip(voxel, -clamp, clamp)
    return voxel[0] if squeeze else voxel


def calculate_flow_error(
    flow_gt: jax.Array,
    flow_pred: jax.Array,
    event_mask: Optional[jax.Array] = None,
    time_scale: Optional[jax.Array] = None,
) -> dict:
    """Masked EPE / n-PE outlier ratios / angular error.

    Parity: ``calculate_flow_error_numpy/tensor`` (``flow_utils.py:706-821``):
    valid GT = finite and both components nonzero; optional event mask;
    AE uses the (1 + u·u') / (√(1+|u|²)√(1+|u'|²)) 3-D angular form.

    Args:
        flow_gt, flow_pred: ``[B, 2, H, W]``.
        event_mask: ``[B, 1, H, W]`` bool.
    """
    flow_mask = (
        jnp.isfinite(flow_gt[:, 0:1]) & jnp.isfinite(flow_gt[:, 1:2])
        & (jnp.abs(flow_gt[:, 0:1]) > 0) & (jnp.abs(flow_gt[:, 1:2]) > 0)
    )
    total_mask = flow_mask if event_mask is None else (event_mask & flow_mask)
    gt = flow_gt * total_mask
    pred = flow_pred * total_mask
    n_points = jnp.sum(total_mask, axis=(1, 2, 3)) + 1e-5
    if time_scale is not None:
        ts = time_scale.reshape(-1, 1, 1, 1)
        gt = gt * ts
        pred = pred * ts

    epe_map = jnp.linalg.norm(gt - pred, axis=1)
    errors = {"EPE": jnp.mean(jnp.sum(epe_map, axis=(1, 2)) / n_points)}
    for n in (1, 2, 3, 5, 10, 20):
        errors[f"{n}PE"] = jnp.mean(
            jnp.sum(epe_map > n, axis=(1, 2)) / n_points)
    u, v = pred[:, 0], pred[:, 1]
    ug, vg = gt[:, 0], gt[:, 1]
    cosang = (1.0 + u * ug + v * vg) / (
        jnp.sqrt(1 + u * u + v * v) * jnp.sqrt(1 + ug * ug + vg * vg))
    errors["AE"] = jnp.mean(
        jnp.sum(jnp.arccos(jnp.clip(cosang, -1.0, 1.0)), axis=(1, 2)) / n_points)
    return errors


def estimate_corresponding_gt_flow(x_flow_in, y_flow_in, gt_timestamps,
                                   start_time, end_time):
    """Propagate per-interval GT flow maps over an arbitrary time window.

    Parity: the EV-FlowNet-derived routine (``flow_utils.py:826-920``):
    chained nearest-neighbour advection of a pixel lattice, zeroing points
    whose sampled flow hits exactly 0.  Host-side numpy (GT tooling).
    """
    import numpy as np

    gt_iter = int(np.searchsorted(gt_timestamps, start_time, side="right") - 1)
    gt_dt = gt_timestamps[gt_iter + 1] - gt_timestamps[gt_iter]
    x_flow = np.squeeze(x_flow_in[gt_iter])
    y_flow = np.squeeze(y_flow_in[gt_iter])
    dt = end_time - start_time
    if gt_dt >= dt:
        return x_flow * dt / gt_dt, y_flow * dt / gt_dt

    h, w = x_flow.shape
    x_idx, y_idx = np.meshgrid(np.arange(w, dtype=np.float32),
                               np.arange(h, dtype=np.float32))
    orig_x, orig_y = x_idx.copy(), y_idx.copy()
    x_mask = np.ones_like(x_idx, bool)
    y_mask = np.ones_like(y_idx, bool)

    def prop(xf, yf, scale=1.0):
        xi = np.clip(np.rint(x_idx), 0, w - 1).astype(int)
        yi = np.clip(np.rint(y_idx), 0, h - 1).astype(int)
        fx = xf[yi, xi]
        fy = yf[yi, xi]
        x_mask[fx == 0] = False
        y_mask[fy == 0] = False
        x_idx[...] = x_idx + fx * scale
        y_idx[...] = y_idx + fy * scale

    scale = (gt_timestamps[gt_iter + 1] - start_time) / gt_dt
    prop(x_flow, y_flow, scale)
    gt_iter += 1
    while gt_timestamps[gt_iter + 1] < end_time:
        prop(np.squeeze(x_flow_in[gt_iter]), np.squeeze(y_flow_in[gt_iter]))
        gt_iter += 1
    final_dt = end_time - gt_timestamps[gt_iter]
    final_gt_dt = gt_timestamps[gt_iter + 1] - gt_timestamps[gt_iter]
    prop(np.squeeze(x_flow_in[gt_iter]), np.squeeze(y_flow_in[gt_iter]),
         final_dt / final_gt_dt)
    x_shift = x_idx - orig_x
    y_shift = y_idx - orig_y
    x_shift[~x_mask] = 0
    y_shift[~y_mask] = 0
    return x_shift, y_shift
