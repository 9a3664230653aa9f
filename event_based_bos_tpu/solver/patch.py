"""Tiled patch solvers: independent (vmapped) and joint (dependent).

TPU-native re-designs of ``PatchEklt`` (``src/solver/patch_eklt.py``) and
``PatchEkltDependent`` (``src/solver/patch_eklt_dependent.py``):

  * **Independent** — the reference loops over patches in Python, running one
    optimizer per tile (``patch_eklt.py:111-131``).  Here every patch's
    window (measurement, gradients, weights) is gathered once and the scalar
    objectives are optimized for *all patches simultaneously* with a vmapped
    ``lax.scan`` — an embarrassingly parallel batch that fills the VPU/MXU.
  * **Joint (dependent)** — all patch parameters form one ``[n_dim, gh, gw]``
    field optimized against the full-image objective
    (``patch_eklt_dependent.py:53-137``); inactive patches (outside the ROI
    or under the event threshold) are masked rather than index-scattered.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gradients import frame_gradients, poisson_to_flow
from ..ops.image_warp import warp_image_shift
from ..optim import run_first_order
from ..types import Events, PatchGrid
from .generative import (
    NORM_EPS,
    GenerativeSpec,
    _safe_frobenius,
    iwe_cache,
    measured_increment,
    patch_to_dense,
)

__all__ = [
    "PatchSpec",
    "extract_patches",
    "patch_event_counts",
    "active_patch_mask",
    "solve_patches_independent",
    "joint_objective",
    "solve_patches_joint",
    "estimate_frame_patch",
    "estimate_frame_dependent",
]


@dataclasses.dataclass(frozen=True)
class PatchSpec:
    """Static tiled-solver configuration (``solver.patch_eklt`` YAML section,
    ``configs/hot_plate1.yaml:85-89``)."""

    gen: GenerativeSpec
    roi: Tuple[int, int, int, int]
    patch_size: int = 4
    sliding_window: int = 2
    method: str = "Adam"
    n_iter: int = 600
    lr: float = 0.01
    lr_decay: float = 0.1
    do_event_thresholding: bool = False
    event_thres: int = 8
    track_best: bool = True

    @property
    def grid(self) -> PatchGrid:
        p, s = self.patch_size, self.sliding_window
        return PatchGrid(self.gen.image_size, (p, p), (s, s))


def extract_patches(image: jax.Array, grid: PatchGrid) -> jax.Array:
    """Gather all patch windows: ``[H, W] → [n_patch, ph, pw]``."""
    ph, pw = grid.patch_size
    sh, sw = grid.stride
    gh, gw = grid.shape
    starts_r = jnp.arange(gh) * sh
    starts_c = jnp.arange(gw) * sw
    rr, cc = jnp.meshgrid(starts_r, starts_c, indexing="ij")

    def one(r, c):
        return jax.lax.dynamic_slice(image, (r, c), (ph, pw))

    return jax.vmap(one)(rr.reshape(-1), cc.reshape(-1))


def patch_event_counts(ev: Events, grid: PatchGrid) -> jax.Array:
    """Live-event count inside each patch window via a summed-area table.

    Replaces the reference's per-patch ``crop_event`` Python loop
    (``patch_eklt.py:117-126``) with one histogram + integral image.
    """
    h, w = grid.image_size
    xi = jnp.clip(ev.x.astype(jnp.int32), 0, h - 1)
    yi = jnp.clip(ev.y.astype(jnp.int32), 0, w - 1)
    flat = jnp.zeros((h * w,), jnp.float32)
    flat = flat.at[xi * w + yi].add(jnp.where(ev.valid, jnp.float32(1), jnp.float32(0)))
    hist = flat.reshape(h, w)
    sat = jnp.pad(jnp.cumsum(jnp.cumsum(hist, 0), 1), ((1, 0), (1, 0)))

    x_min, x_max, y_min, y_max = grid.bounds()
    x0 = jnp.clip(jnp.asarray(np.ceil(x_min), jnp.int32), 0, h)
    x1 = jnp.clip(jnp.asarray(np.ceil(x_max), jnp.int32), 0, h)
    y0 = jnp.clip(jnp.asarray(np.ceil(y_min), jnp.int32), 0, w)
    y1 = jnp.clip(jnp.asarray(np.ceil(y_max), jnp.int32), 0, w)
    return sat[x1, y1] - sat[x0, y1] - sat[x1, y0] + sat[x0, y0]


def active_patch_mask(ev: Events, spec: PatchSpec) -> jax.Array:
    """{0,1} mask of patches estimated: center inside ROI, enough events.

    Parity: ``patch_eklt.py:111-126`` / ``patch_eklt_dependent.py:62-80``.
    """
    grid = spec.grid
    roi = jnp.asarray(grid.roi_mask(*spec.roi))
    if spec.do_event_thresholding:
        counts = patch_event_counts(ev, grid)
        roi = roi & (counts > spec.event_thres)
    return roi.astype(spec.gen.dtype)


# ---------------------------------------------------------------------------
# Independent per-patch solver (PatchEklt)
# ---------------------------------------------------------------------------

def _patch_objective(theta, measured_p, gx_p, gy_p, wi_p, w_p, spec: PatchSpec):
    """Scalar objective on one patch window (angle model by default).

    Parity: ``PatchEklt._make_prediction_torch`` (``patch_eklt.py:328-352``):
    gradients cropped to the patch, then globally shifted by (p_x, p_y);
    prediction dotted with (sin θ, cos θ), L2-normalized; hybrid cost over the
    constant patch flow.
    """
    gen = spec.gen
    if gen.angle_model:
        vx, vy = jnp.sin(theta[0]), jnp.cos(theta[0])
        rest = theta[1:]
    else:
        vx, vy = theta[0], theta[1]
        rest = theta[2:]
    if gen.optimize_warp:
        shift = rest[:2]
        gx_p = warp_image_shift(gx_p, shift)
        gy_p = warp_image_shift(gy_p, shift)
    pred = vx * gx_p + vy * gy_p
    if gen.no_polarity:
        pred = jnp.abs(pred)
    if w_p is not None:
        pred = pred * w_p
    pred = pred / (_safe_frobenius(pred) + NORM_EPS)

    flow = jnp.broadcast_to(jnp.stack([vx, vy])[:, None, None],
                            (2,) + gx_p.shape)
    arg = {"prediction": pred, "measurement": measured_p, "flow": flow,
           "weights": wi_p, "omit_boundary": True}
    if gen.optimize_warp:
        arg["pxy"] = jnp.broadcast_to(rest[:2, None, None], (2,) + gx_p.shape)
    loss, _ = gen.cost_fn()(arg)
    return loss


def solve_patches_independent(
    histogram: jax.Array,
    weights: Optional[jax.Array],
    weight_inverse: jax.Array,
    gx: jax.Array,
    gy: jax.Array,
    active: jax.Array,
    key: jax.Array,
    spec: PatchSpec,
):
    """All-patches-at-once independent optimization → ``[2, gh, gw]`` flow."""
    gen = spec.gen
    grid = spec.grid
    gh, gw = grid.shape
    n = gh * gw

    hist_p = extract_patches(histogram, grid)
    norm = jnp.linalg.norm(hist_p.reshape(n, -1), axis=-1)
    w_p = None
    if weights is not None:
        w_p = extract_patches(weights, grid)
        hist_p = w_p * hist_p
        norm = jnp.linalg.norm(hist_p.reshape(n, -1), axis=-1)
    measured_p = hist_p / jnp.maximum(norm, 1e-30)[:, None, None]
    gx_p = extract_patches(gx, grid)
    gy_p = extract_patches(gy, grid)
    wi_p = extract_patches(weight_inverse, grid)

    dim = (1 if gen.angle_model else 2) + (2 if gen.optimize_warp else 0)
    x0 = jnp.zeros((n, dim), gen.dtype)
    if gen.angle_model:
        x0 = x0.at[:, 0].set(jnp.pi)

    def solve_one(x0_i, m_i, gx_i, gy_i, wi_i, w_i):
        def obj(theta):
            return _patch_objective(theta, m_i, gx_i, gy_i, wi_i, w_i, spec)
        res = run_first_order(obj, x0_i, spec.n_iter, spec.method,
                              lr=spec.lr, lr_decay=spec.lr_decay,
                              track_best=spec.track_best)
        return res.param, res.loss

    if w_p is None:
        solve = jax.vmap(lambda a, b, c, d, e: solve_one(a, b, c, d, e, None))
        thetas, losses = solve(x0, measured_p, gx_p, gy_p, wi_p)
    else:
        thetas, losses = jax.vmap(solve_one)(x0, measured_p, gx_p, gy_p, wi_p, w_p)

    if gen.angle_model:
        u = jnp.sin(thetas[:, 0])
        v = jnp.cos(thetas[:, 0])
    else:
        u = thetas[:, 0]
        v = thetas[:, 1]
    patched = jnp.stack([u, v]).reshape(2, gh, gw) * active[None]
    return patched, {"losses": losses.reshape(gh, gw), "thetas": thetas}


def estimate_frame_patch(ev: Events, frame: jax.Array, key: jax.Array,
                         spec: PatchSpec):
    """Per-frame independent tiled solve → dense flow ``[2, H, W]``.

    Parity: ``PatchEklt.estimate`` (``patch_eklt.py:98-136``).
    """
    gen = spec.gen
    gx, gy = frame_gradients(frame.astype(gen.dtype), ksize=gen.sobel_ksize,
                             use_log_intensity=gen.use_log_intensity)
    hist, weights, weight_inverse = iwe_cache(ev, gen)
    active = active_patch_mask(ev, spec)
    patched, aux = solve_patches_independent(
        hist, weights, weight_inverse, gx, gy, active, key, spec)
    dense = patch_to_dense(patched, spec.grid)
    return dense, aux


# ---------------------------------------------------------------------------
# Joint (dependent) solver
# ---------------------------------------------------------------------------

def joint_objective(
    params: jax.Array,
    patch_mask: jax.Array,
    measured: jax.Array,
    gx: jax.Array,
    gy: jax.Array,
    weight_inverse: jax.Array,
    grid: PatchGrid,
    spec_gen: GenerativeSpec,
    roi: Tuple[int, int, int, int],
    weights: Optional[jax.Array] = None,
):
    """Joint objective with inactive-patch masking, evaluated on the ROI crop.

    Parity: ``PatchEkltDependent._objective_scipy`` via the inherited GML
    implementation (``gml:343-373``) — cost terms are cropped to the ROI —
    plus the zero-fill of inactive patches (``dependent.py:199-215``: poisson
    params are masked *before* the Sobel, velocity/translation *after* the
    angle transform).
    """
    from .generative import predict_increment  # local to avoid cycle noise

    x0, x1, y0, y1 = roi
    if spec_gen.poisson_model:
        masked = params.at[0].mul(patch_mask)
        patch_flow = poisson_to_flow(masked[0], ksize=spec_gen.sobel_ksize)
        intensity = patch_to_dense(masked[0], grid)
    elif spec_gen.angle_model:
        patch_flow = jnp.stack([jnp.sin(params[0]), jnp.cos(params[0])]) * patch_mask
        intensity = None
    else:
        patch_flow = params[:2] * patch_mask
        intensity = None
    flow = patch_to_dense(patch_flow, grid)
    pxy = None
    if spec_gen.optimize_warp:
        pxy = patch_to_dense(params[-2:] * patch_mask, grid)

    pred = predict_increment(flow, gx, gy, spec_gen, pxy, weights, mask=None)
    arg = {
        "prediction": pred[x0:x1, y0:y1],
        "measurement": measured,
        "flow": flow[:, x0:x1, y0:y1],
        "weights": weight_inverse[x0:x1, y0:y1],
        "omit_boundary": True,
    }
    if pxy is not None:
        arg["pxy"] = pxy[:, x0:x1, y0:y1]
    if intensity is not None:
        arg["intensity"] = intensity[x0:x1, y0:y1]
    return spec_gen.cost_fn()(arg)


def solve_patches_joint(
    histogram: jax.Array,
    weights: Optional[jax.Array],
    weight_inverse: jax.Array,
    gx: jax.Array,
    gy: jax.Array,
    patch_mask: jax.Array,
    key: jax.Array,
    spec: PatchSpec,
    lr: float = 0.05,  # dependent solver uses 0.05 (``dependent.py:95``)
):
    """One joint optimization over the full parameter field."""
    from .generative import initialize_params

    gen = spec.gen
    grid = spec.grid
    measured = measured_increment(histogram, weights, roi=spec.roi)
    weights_roi = None if weights is None else weights  # full-image weights

    x0 = initialize_params(key, grid.shape, gen)

    def obj(p):
        loss, _ = joint_objective(p, patch_mask, measured, gx, gy,
                                  weight_inverse, grid, gen, spec.roi,
                                  weights=weights_roi)
        return loss

    result = run_first_order(obj, x0, spec.n_iter, spec.method, lr=lr,
                             lr_decay=spec.lr_decay, track_best=spec.track_best)
    params = result.param
    if gen.poisson_model:
        patch_flow = poisson_to_flow(params[0] * patch_mask, ksize=gen.sobel_ksize)
    elif gen.angle_model:
        patch_flow = jnp.stack([jnp.sin(params[0]), jnp.cos(params[0])]) * patch_mask
    else:
        patch_flow = params[:2] * patch_mask
    dense = patch_to_dense(patch_flow, grid)
    return dense, {"params": params, "history": result.history,
                   "loss": result.loss}


def estimate_frame_dependent(ev: Events, frame: jax.Array, key: jax.Array,
                             spec: PatchSpec):
    """Per-frame joint tiled solve (``PatchEkltDependent.estimate``,
    ``dependent.py:53-137``)."""
    gen = spec.gen
    gx, gy = frame_gradients(frame.astype(gen.dtype), ksize=gen.sobel_ksize,
                             use_log_intensity=gen.use_log_intensity)
    hist, weights, weight_inverse = iwe_cache(ev, gen)
    active = active_patch_mask(ev, spec)
    return solve_patches_joint(hist, weights, weight_inverse, gx, gy, active,
                               key, spec)
