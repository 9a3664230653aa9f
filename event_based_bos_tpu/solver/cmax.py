"""Contrast-maximization (CMax) solver family — events-only flow estimation.

The reference documents a ``contrast_maximization`` solver in its configs
README but does not ship it (SURVEY §2 dead/latent list); BASELINE.json's
benchmark configs center on exactly this pipeline ("CM flow via IWE variance
cost", "alternate contrast costs", "tile/patch-wise dense flow with
multi-scale warp").  This module provides it TPU-natively:

  * candidate motion warps every event (``ops.warp``, differentiable),
  * the warped events are accumulated into a blurred IWE
    (``ops.iwe.bilinear_vote`` — differentiable w.r.t. the warped
    coordinates through the bilinear weights),
  * a contrast objective (variance / gradient magnitude / FWL) is maximized
    with an on-device optimizer, coarse-to-fine for the dense patch model.

Unlike the generative (EKLT) family this needs **gradients through the
event scatter**, which the masked 4-corner vote provides natively.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import costs as costs_mod
from ..ops.iwe import bilinear_vote, gaussian_blur
from ..ops.warp import warp_event_2dof, warp_event_dense_flow, calculate_reftime
from ..optim import (
    SAMPLER_METHODS,
    SCIPY_METHODS,
    run_first_order,
    run_sampler,
    run_scipy_method,
)
from ..types import Events, PatchGrid
from .generative import patch_to_dense

__all__ = ["CmaxSpec", "contrast_loss", "solve_cmax_translation",
           "solve_cmax_dense", "estimate_frame_cmax"]


@dataclasses.dataclass(frozen=True)
class CmaxSpec:
    """Static CMax configuration.

    ``motion_model``: ``"2d-translation"`` fits one global (vx, vy);
    ``"dense-flow"`` fits a per-patch flow field coarse-to-fine.
    ``contrast_weights``: weighted contrast terms, maximized (variance /
    gradient_magnitude).  ``smoothness`` adds the image_gradient TV prior on
    the dense flow (dense model only).
    """

    image_size: Tuple[int, int]
    roi: Optional[Tuple[int, int, int, int]] = None
    motion_model: str = "dense-flow"
    contrast_weights: Tuple[Tuple[str, float], ...] = (("image_variance", 1.0),)
    smoothness: float = 0.01
    iwe_sigma: float = 1.0
    direction: str = "middle"
    coarsest_patch: int = 64
    finest_patch: int = 16
    n_iter: int = 240
    method: str = "Adam"
    lr: float = 0.05
    lr_decay: float = 0.1
    param_bounds: Tuple[Tuple[float, float], ...] = ((-30.0, 30.0),
                                                     (-30.0, 30.0))
    dtype: jnp.dtype = jnp.float32
    # Time-binned dense CMax: >0 scatters events ONCE into `time_bins`
    # per-bin histograms and runs the optimization loop as pure stencil
    # image warps — no per-event gather/scatter inside the loop (the
    # per-event path costs ~60 ms/iteration at 0.5 M events on TPU v5e;
    # the binned path runs at generative-loop speed).  0 = exact per-event.
    time_bins: int = 16
    # Stencil radius for the binned warp.  Accuracy envelope: the binned IWE
    # matches the exact per-event warp while every per-bin shift satisfies
    # |dt·flow| ≤ warp_radius — for direction "middle" (|dt| ≤ 0.5) that is
    # |flow| ≤ 2·warp_radius px/window; beyond it shifts truncate to the
    # stencil support and contrast degrades
    # (tests/test_cmax.py::test_binned_accuracy_envelope_vs_warp_radius).
    # Timestamp quantization to bin centers adds O(|flow|/time_bins) px
    # blur, negligible at the default 16 bins for BOS-scale flows.
    warp_radius: int = 2
    # fuse the binned warp-accumulate into the custom Pallas kernel
    # (ops.cmax_pallas) — reads each histogram tile once per iteration
    use_pallas: bool = True

    @property
    def n_scales(self) -> int:
        return int(math.log2(self.coarsest_patch / self.finest_patch)) + 1


def contrast_loss(iwe: jax.Array, spec: CmaxSpec) -> jax.Array:
    """Negated weighted contrast (so minimizers maximize sharpness)."""
    total = jnp.asarray(0.0, iwe.dtype)
    for name, w in spec.contrast_weights:
        total = total + w * costs_mod.functions[name]({"iwe": iwe})
    return -total


def _roi_iwe(ev: Events, spec: CmaxSpec) -> jax.Array:
    iwe = bilinear_vote(ev, spec.image_size)
    if spec.iwe_sigma:
        iwe = gaussian_blur(iwe, spec.iwe_sigma, mode="reflect")
    if spec.roi is not None:
        x0, x1, y0, y1 = spec.roi
        iwe = iwe[x0:x1, y0:y1]
    return iwe


def solve_cmax_translation(ev: Events, key: jax.Array, spec: CmaxSpec,
                           x0: Optional[jax.Array] = None):
    """Global 2-DoF CMax fit; returns ``(motion [2], result)``.

    The fitted motion is the *warp* parameter; the corresponding flow is its
    negative (events displaced by +v need warp −v to sharpen) — returned
    as-is to match :func:`ops.warp.warp_event_2dof` semantics.

    With ``time_bins > 0`` the objective shifts per-bin histograms through
    banded matmul operators (:func:`ops.image_warp.shift_image_matrix` —
    exact for any shift magnitude, MXU-resident, no per-event work in the
    loop); ``time_bins = 0`` warps every event exactly.
    """
    ref_time = calculate_reftime(ev, spec.direction)

    if spec.time_bins > 0:
        from ..ops.image_warp import shift_image_matrix

        hists, dts = binned_histograms(ev, spec)

        def objective(theta):
            # event warp x' = x + dt·θ → bin content shifts by +dt_b·θ
            def one(h, d):
                return shift_image_matrix(h, d * theta)

            iwe = jnp.sum(jax.vmap(one)(hists, dts), axis=0)
            if spec.iwe_sigma:
                iwe = gaussian_blur(iwe, spec.iwe_sigma, mode="reflect")
            if spec.roi is not None:
                x0_, x1_, y0_, y1_ = spec.roi
                iwe = iwe[x0_:x1_, y0_:y1_]
            return contrast_loss(iwe, spec)
    else:
        def objective(theta):
            warped = warp_event_2dof(ev, theta, ref_time, normalize_t=True)
            return contrast_loss(_roi_iwe(warped, spec), spec)

    # the 2-DoF model has exactly two parameters; configs that reuse a wider
    # GML-style optimizer.parameters block are truncated to the leading pair
    # (and a short/missing block falls back to the default box)
    pb = spec.param_bounds[:2]
    if len(pb) < 2:
        pb = tuple(pb) + ((-30.0, 30.0),) * (2 - len(pb))
    lo = jnp.array([b[0] for b in pb], spec.dtype)
    hi = jnp.array([b[1] for b in pb], spec.dtype)
    if spec.method in SAMPLER_METHODS:
        result = run_sampler(objective, (lo, hi), spec.n_iter, spec.method, key)
        return result.param, result
    if x0 is None:
        x0 = jnp.zeros((2,), spec.dtype)
    # param_bounds are honored on every path: samplers draw inside the box,
    # the quasi-Newton and first-order loops project each iterate onto it.
    if spec.method in SCIPY_METHODS:
        result = run_scipy_method(objective, x0, spec.n_iter, spec.method,
                                  bounds=(lo, hi))
    else:
        result = run_first_order(objective, x0, spec.n_iter, spec.method,
                                 lr=spec.lr, lr_decay=spec.lr_decay,
                                 bounds=(lo, hi))
    return result.param, result


def binned_histograms(ev: Events, spec: CmaxSpec):
    """Scatter events once into ``time_bins`` histograms + per-bin dt.

    ``dt_b`` is the bin center in warp-normalized time (direction-relative,
    matching ``calculate_dt(..., normalize_t=True)``): for ``"middle"`` the
    centers span (−0.5, 0.5).
    """
    from ..ops.events import _masked_min_max

    b = spec.time_bins
    tmin, tmax = _masked_min_max(ev.t, ev.valid)
    frac = jnp.clip((ev.t - tmin) / jnp.maximum(tmax - tmin, 1e-30), 0.0, 1.0)
    bins = jnp.clip(jnp.floor(frac * b).astype(jnp.int32), 0, b - 1)

    hists = []
    for i in range(b):
        hists.append(bilinear_vote(ev.mask_where(bins == i), spec.image_size))
    hists = jnp.stack(hists)
    alias = {"first": 0.0, "middle": 0.5, "last": 1.0}
    ref_frac = alias.get(spec.direction, 0.5) if isinstance(spec.direction, str) \
        else float(spec.direction)
    dt = (jnp.arange(b, dtype=spec.dtype) + 0.5) / b - ref_frac
    return hists, dt


def _roi_box(spec: CmaxSpec):
    """ROI box expanded by the warp radius (content can flow in from the
    margin), clipped to the frame."""
    if spec.roi is None:
        return None
    h, w = spec.image_size
    x0, x1, y0, y1 = spec.roi
    r = spec.warp_radius
    return (max(0, x0 - r), min(h, x1 + r), max(0, y0 - r), min(w, y1 + r))


def binned_iwe(hists: jax.Array, dt: jax.Array, flow: jax.Array,
               spec: CmaxSpec) -> jax.Array:
    """IWE of the binned representation under a candidate dense flow.

    Event mass in bin b displaces by ``−dt_b·flow``; the equivalent image
    operation is the gather-free stencil warp with shift ``−dt_b·flow``.

    When ``hists``/``flow`` cover only the expanded ROI box (see
    :func:`_roi_box` and the cropped path in :func:`solve_cmax_dense`), the
    returned IWE is the ROI crop directly.
    """
    if spec.use_pallas and jax.default_backend() == "tpu":
        from ..ops.cmax_pallas import binned_warp_accumulate

        iwe = binned_warp_accumulate(hists, flow, dt, spec.warp_radius)
    else:
        from ..ops.image_warp import warp_image_stencil

        def one(h, d):
            return warp_image_stencil(h, -d * flow, spec.warp_radius)

        iwe = jnp.sum(jax.vmap(one)(hists, dt), axis=0)
    if spec.iwe_sigma:
        iwe = gaussian_blur(iwe, spec.iwe_sigma, mode="reflect")
    if spec.roi is not None:
        # slice the ROI out of whatever box the inputs covered
        box = _roi_box(spec)
        if hists.shape[-2:] == tuple(spec.image_size):
            x0, x1, y0, y1 = spec.roi
        else:
            bx0, _bx1, by0, _by1 = box
            x0 = spec.roi[0] - bx0
            x1 = spec.roi[1] - bx0
            y0 = spec.roi[2] - by0
            y1 = spec.roi[3] - by0
        iwe = iwe[x0:x1, y0:y1]
    return iwe


def solve_cmax_dense(ev: Events, key: jax.Array, spec: CmaxSpec,
                     init: Optional[jax.Array] = None):
    """Coarse-to-fine dense patch-flow CMax; returns ``(flow [2,H,W], aux)``.

    Per scale, a ``[2, gh, gw]`` patch-flow field is upsampled to dense and
    the blurred-IWE contrast plus a TV smoothness prior is optimized; the
    result seeds the next finer scale.  With ``spec.time_bins > 0`` the
    objective uses the binned gather-free formulation (:func:`binned_iwe`);
    otherwise events are warped individually (exact timestamps,
    differentiable through the scatter — slower on TPU).
    """
    ref_time = calculate_reftime(ev, spec.direction)
    hists = dts = None
    box = _roi_box(spec)
    if spec.time_bins > 0:
        hists, dts = binned_histograms(ev, spec)
        if box is not None:
            bx0, bx1, by0, by1 = box
            hists = hists[:, bx0:bx1, by0:by1]
    grids: List[PatchGrid] = []
    for i in range(spec.n_scales):
        p = spec.coarsest_patch // (2**i)
        grids.append(PatchGrid(spec.image_size, (p, p), (p, p)))
    iters = [spec.n_iter // (spec.n_scales - i + 1)
             for i in range(spec.n_scales)]

    from ..ops.image_warp import resize_bilinear

    params = None
    histories = []
    for i, (grid, n_it) in enumerate(zip(grids, iters)):
        if i == 0:
            x0 = (init if init is not None
                  else jnp.zeros((2,) + grid.shape, spec.dtype))
        else:
            x0 = resize_bilinear(params, grid.shape)

        def objective(p, _grid=grid):
            if spec.time_bins > 0:
                flow_box = patch_to_dense(p, _grid, crop=box)
                iwe = binned_iwe(hists, dts, flow_box, spec)
                loss = contrast_loss(iwe, spec)
                if spec.smoothness:
                    loss = loss + spec.smoothness * costs_mod.image_gradient(
                        {"flow": flow_box, "weights": 1.0,
                         "omit_boundary": True})
                return loss
            flow = patch_to_dense(p, _grid)
            warped = warp_event_dense_flow(ev, flow, ref_time,
                                           normalize_t=True)
            iwe = _roi_iwe(warped, spec)
            loss = contrast_loss(iwe, spec)
            if spec.smoothness:
                loss = loss + spec.smoothness * costs_mod.image_gradient(
                    {"flow": flow, "weights": 1.0, "omit_boundary": True})
            return loss

        result = run_first_order(objective, x0, n_it, spec.method,
                                 lr=spec.lr, lr_decay=spec.lr_decay)
        params = result.param
        histories.append(result.history)

    dense_flow = patch_to_dense(params, grids[-1])
    return dense_flow, {"params": params, "loss_history": histories}


def estimate_frame_cmax(ev: Events, frame, key: jax.Array, spec: CmaxSpec,
                        **_kwargs):
    """Per-frame CMax estimate → dense flow ``[2, H, W]`` (+aux).

    ``frame`` is accepted (ignored) for API uniformity with the generative
    solvers — CMax is events-only.
    """
    if spec.motion_model in ("2d-translation", "rigid-optical-flow"):
        motion, result = solve_cmax_translation(ev, key, spec)
        flow = jnp.broadcast_to((-motion)[:, None, None],
                                (2,) + tuple(spec.image_size))
        return flow, {"motion": motion, "loss": result.loss,
                      "history": result.history}
    if spec.motion_model == "dense-flow":
        return solve_cmax_dense(ev, key, spec)
    raise KeyError(f"motion_model {spec.motion_model!r} not supported")
