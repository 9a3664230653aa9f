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
    FIRST_ORDER_METHODS,
    QUASI_NEWTON_METHODS,
    SAMPLER_METHODS,
    run_first_order,
    run_lbfgs,
    run_sampler,
)
from ..types import Events, PatchGrid
from .generative import patch_to_dense
from .pyramid import PyramidSpec  # noqa: F401  (same pyramid scheduling idea)

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
    """
    ref_time = calculate_reftime(ev, spec.direction)

    def objective(theta):
        warped = warp_event_2dof(ev, theta, ref_time, normalize_t=True)
        return contrast_loss(_roi_iwe(warped, spec), spec)

    if spec.method in SAMPLER_METHODS:
        lo = jnp.array([b[0] for b in spec.param_bounds], spec.dtype)
        hi = jnp.array([b[1] for b in spec.param_bounds], spec.dtype)
        result = run_sampler(objective, (lo, hi), spec.n_iter, spec.method, key)
        return result.param, result
    if x0 is None:
        x0 = jnp.zeros((2,), spec.dtype)
    if spec.method in QUASI_NEWTON_METHODS:
        result = run_lbfgs(objective, x0, spec.n_iter)
    else:
        result = run_first_order(objective, x0, spec.n_iter, spec.method,
                                 lr=spec.lr, lr_decay=spec.lr_decay)
    return result.param, result


def solve_cmax_dense(ev: Events, key: jax.Array, spec: CmaxSpec,
                     init: Optional[jax.Array] = None):
    """Coarse-to-fine dense patch-flow CMax; returns ``(flow [2,H,W], aux)``.

    Per scale, a ``[2, gh, gw]`` patch-flow field is upsampled to dense,
    events are warped through it (gather at their pixels, differentiable
    w.r.t. the field), and the blurred-IWE contrast plus a TV smoothness
    prior is optimized; the result seeds the next finer scale.
    """
    ref_time = calculate_reftime(ev, spec.direction)
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
            flow = patch_to_dense(p, _grid)
            warped = warp_event_dense_flow(ev, flow, ref_time,
                                           normalize_t=True)
            loss = contrast_loss(_roi_iwe(warped, spec), spec)
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
