"""Generative-model building blocks (EKLT-style) shared by all solvers.

The reference expresses its four solvers as a class hierarchy
(``GenerativeMaximumLikelihood → PatchEklt → PatchEkltDependent →
PatchEkltPyramid2``) that differ mainly in *parameter granularity*
(1 global patch → tiled → joint tiled → pyramid).  Here the shared math is a
set of pure functions over a static :class:`GenerativeSpec`, so each solver is
"an objective + an optimizer schedule", fully jittable:

  * :func:`iwe_cache` — polarity histogram / weight maps
    (``patch_eklt.py:271-306``).
  * :func:`measured_increment` — normalized measurement
    (``generative_max_likelihood.py:531-575`` / ``patch_eklt_pyramid2.py:329-343``).
  * :func:`patch_to_dense` — patch-grid → dense interpolation
    (``patch_eklt.py:138-204``).
  * :func:`predict_increment` — the generative model ``v·∇I`` with optional
    per-pixel pattern-translation warp
    (``patch_eklt_pyramid2.py:345-365``; ``gml:459-487``).
  * :func:`dense_objective` / :func:`scalar_objective` — full objectives with
    the hybrid cost (``patch_eklt_pyramid2.py:368-397``, ``gml:343-373``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import costs as costs_mod
from ..ops.gradients import poisson_to_flow
from ..ops.image_warp import (
    warp_image_forward,
    warp_image_shift,
    warp_image_stencil,
)
from ..ops.iwe import create_polarity_iwe, gaussian_blur
from ..types import Events, PatchGrid

__all__ = [
    "GenerativeSpec",
    "iwe_cache",
    "measured_increment",
    "patch_to_dense",
    "predict_increment",
    "params_to_fields",
    "dense_objective",
    "scalar_prediction",
    "scalar_objective",
    "initialize_params",
    "scalar_param_dim",
    "unfold_scalar_params",
]

NORM_EPS = 1e-4  # prediction L2-normalization epsilon (``gml:486``)


def _safe_frobenius(x: jax.Array) -> jax.Array:
    """Frobenius norm with a zero subgradient at exactly-zero input.

    The plain (vx, vy) model initializes at zero, making the prediction
    identically zero; ``jnp.linalg.norm`` then back-propagates NaN (torch
    does the same — the reference's loop catches the exception and silently
    returns the init, ``gml:334-338``).  This fixes that failure mode.
    """
    acc = jnp.float32 if x.dtype == jnp.bfloat16 else x.dtype
    sq = jnp.sum((x * x).astype(acc))
    zero = sq == 0
    return jnp.where(zero, 0.0,
                     jnp.sqrt(jnp.where(zero, 1.0, sq))).astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class GenerativeSpec:
    """Static configuration of the generative model (hashable, jit-static).

    Field meanings track the ``generative_ml`` YAML section
    (``configs/hot_plate1.yaml:70-84``).
    """

    image_size: Tuple[int, int]
    no_polarity: bool = False
    iwe_sigma: float = 2.0
    weight_by_event_hist: bool = False
    weight_sigma: float = 5.0
    weight_by_inverse_event_hist: bool = True
    optimize_warp: bool = True
    angle_model: bool = False
    poisson_model: bool = True
    use_log_intensity: bool = False
    # Interpret the two warp parameters as (p_magn, p_angle) instead of
    # (p_x, p_y) — YAML key ``px-py_as-angle-magnitude``
    # (``gml:130-135,144-161``).  The reference restricts this to the optuna
    # sampler; here the unfold is differentiable so every scalar optimizer
    # supports it.
    pxpy_as_anglemagn: bool = False
    sobel_ksize: int = 3
    cost_weights: Tuple[Tuple[str, float], ...] = (
        ("diff_norm", 1.0),
        ("image_gradient", 0.5),
        ("flow_norm_pxy", 0.1),
    )
    dtype: jnp.dtype = jnp.float32
    # Static bound on the per-pixel pattern shift |pxy| (px): enables the
    # gather-free stencil warp (see ops.image_warp.warp_image_stencil).
    # 0 selects the general gather-based warp (slow on TPU).
    warp_stencil_radius: int = 1
    # Dtype for the memory-bound interior of the objective (field
    # interpolation + gradient warp); reductions and the optimizer state stay
    # in ``dtype``.  bfloat16 roughly halves the HBM traffic of the
    # optimization loop at a small accuracy cost (validated against the f32
    # path in tests).  None = use ``dtype``.
    compute_dtype: Optional[jnp.dtype] = None
    # Narrower option: bfloat16 only inside the pattern-shift warp stencil
    # (its shifted-copy materializations are the loop's biggest VPU cost).
    # Measured at the benchmark: −5.7 ms/frame, EPE 0.234 vs 0.231 over 5
    # seeds (within the seed spread).  Off by default — the warp numerics
    # change slightly, unlike the image_gradient restructure.
    warp_compute_bf16: bool = False
    # Compute the per-frame polarity vote with the Pallas hat-matmul kernel
    # (:mod:`event_based_bos_tpu.ops.iwe_pallas`) instead of the XLA
    # 4-corner scatter.  Bit-exact for integer sensor coordinates; 14.3 →
    # 6.2 ms at benchmark scale as a standalone cache program, but ~10 ms
    # SLOWER when embedded in the one big jitted solve (the custom call
    # blocks fusion around it) — so the default (None) resolves to the
    # scatter HERE, and the pyramid facade instead dispatches the cache as
    # its own program with this kernel on TPU (``split_iwe_cache: auto``,
    # 171.5 → 163.0 ms/frame — `docs/performance.md` §dispatch split).
    # (The kernel does not lower on CPU outside interpret mode.)
    pallas_iwe: Optional[bool] = None

    @property
    def param_dim(self) -> int:
        """Parameters per patch: intensity|angle|[vx,vy]  (+2 when warping).

        Parity: ``GenerativeMaximumLikelihood._initialize_velocity``
        (``gml:425-450``).
        """
        base = 1 if (self.poisson_model or self.angle_model) else 2
        return base + (2 if self.optimize_warp else 0)

    def cost_fn(self):
        return costs_mod.hybrid_cost(dict(self.cost_weights))

    @property
    def needs_intensity(self) -> bool:
        """True when some configured cost consumes the dense intensity field."""
        return any("intensity" in name for name, _w in self.cost_weights)


# ---------------------------------------------------------------------------
# Measurement side
# ---------------------------------------------------------------------------

def polarity_votes(ev: Events, spec: GenerativeSpec) -> jax.Array:
    """Raw ``[2, H, W]`` polarity vote images — the *linear* part of the IWE
    cache.  Shardable over the event axis: partial votes from event shards
    sum (``psum``) to the full image (see
    :mod:`event_based_bos_tpu.parallel.sharding`)."""
    return create_polarity_iwe(ev.astype(spec.dtype), spec.image_size)


def iwe_cache_from_votes(pol: jax.Array, spec: GenerativeSpec):
    """Nonlinear postprocessing of the polarity votes (blur / weight maps)."""
    if spec.no_polarity:
        hist = pol[0] + pol[1]
    else:
        hist = pol[0] - pol[1]

    weights = None
    if spec.weight_by_event_hist:
        weights = gaussian_blur(jnp.abs(hist), spec.weight_sigma, mode="reflect")

    hist_s = gaussian_blur(hist, spec.iwe_sigma, mode="reflect") if spec.iwe_sigma else hist

    if spec.weight_by_inverse_event_hist:
        wi = gaussian_blur(jnp.abs(hist), 10.0, mode="symmetric")
        wi = jnp.clip(wi, 0.0, jnp.mean(wi) + jnp.std(wi) / 2.0)
        wi = wi / jnp.max(wi)
        weight_inverse = 1.0 - 0.95 * wi
    else:
        weight_inverse = jnp.ones_like(hist)
    return hist_s, weights, weight_inverse


def iwe_cache(ev: Events, spec: GenerativeSpec):
    """Per-frame event-histogram cache.

    Returns ``(histogram, weights, weight_inverse)``:
      * histogram — signed polarity vote image, optionally Gaussian-smoothed
        with ``iwe_sigma`` (cv2-style reflect-101 border).
      * weights — |histogram| blurred with ``weight_sigma`` or ``None``.
      * weight_inverse — down-weighting map for event-dense regions
        (σ=10 scipy-style blur, clip at mean+std/2, scale, ``1 − 0.95·x``).

    Parity: ``PatchEklt.calculate_iwe_cache`` (``patch_eklt.py:271-306``)
    — the reference scatters positive and negative votes into separate
    images and subtracts; here one signed scatter produces ``pos − neg``
    (or ``pos + neg`` for ``no_polarity``) directly, mathematically
    identical at half the scatter cost.

    With ``spec.pallas_iwe=True`` the signed vote runs as the Pallas
    hat-matmul kernel — bit-exact vs the scatter for the integer sensor
    coordinates this cache always sees (equivalence:
    ``tests/test_pallas_kernel.py``, and on real hardware every round in
    ``bench.py``) and 2.3× faster as a standalone cache program; the
    pyramid facade jits exactly that standalone program on TPU
    (``split_iwe_cache: auto`` — `docs/performance.md` §dispatch split).
    Embedded in one big solve program the kernel is slower than the
    scatter, so the in-solve default stays the scatter.
    """
    from ..ops.iwe import bilinear_vote

    use_pallas = bool(spec.pallas_iwe)

    ev = ev.astype(spec.dtype)
    if use_pallas:
        from ..ops.iwe_pallas import bilinear_vote_pallas, signed_vote_pallas

        if spec.no_polarity:
            hist = bilinear_vote_pallas(ev, spec.image_size)
        else:
            hist = signed_vote_pallas(ev, spec.image_size)
        hist = hist.astype(spec.dtype)
    elif spec.no_polarity:
        hist = bilinear_vote(ev, spec.image_size)
    else:
        sign = jnp.where(ev.p > 0, jnp.asarray(1, spec.dtype),
                         jnp.asarray(-1, spec.dtype))
        hist = bilinear_vote(ev, spec.image_size, weight=sign)
    pseudo_votes = jnp.stack([hist, jnp.zeros_like(hist)])
    return iwe_cache_from_votes(pseudo_votes, spec)


def measured_increment(
    histogram: jax.Array,
    weights: Optional[jax.Array],
    roi: Optional[Tuple[int, int, int, int]] = None,
) -> jax.Array:
    """L2-normalized measured brightness increment.

    With ``roi`` the histogram (and weights) are cropped before normalization
    (``gml:531-575``); without, the full image is normalized as the pyramid
    solver does (``patch_eklt_pyramid2.py:329-343``).
    """
    m = histogram
    w = weights
    if roi is not None:
        x0, x1, y0, y1 = roi
        m = m[x0:x1, y0:y1]
        w = None if w is None else w[x0:x1, y0:y1]
    if w is not None:
        m = w * m
    return m / jnp.linalg.norm(m)


# ---------------------------------------------------------------------------
# Parameter field → dense fields
# ---------------------------------------------------------------------------

def patch_to_dense(
    field: jax.Array,
    grid: PatchGrid,
    out_size: Optional[Tuple[int, int]] = None,
    crop: Optional[Tuple[int, int, int, int]] = None,
) -> jax.Array:
    """Interpolate a per-patch field ``[..., gh, gw]`` to dense ``[..., H, W]``.

    Procedure (parity with ``interpolate_dense_flow_from_patch_tensor``,
    ``patch_eklt.py:173-204``): replicate-pad the patch grid by
    ``patch/2 // stride + 1``, bilinear-resize by the stride factor
    (half-pixel sampling = torchvision resize), then center-crop to the image.

    Implemented by slicing the cached interpolation matrices to exactly the
    output rows/cols, so no out-of-crop pixels are ever computed.  ``crop``
    (x0, x1, y0, y1 in image coordinates) restricts the output further —
    used by the ROI-restricted objective.

    Formulation note (measured on v5e, 720×1280 solve): the dense banded
    matmuls beat the "obvious" phase-decomposed shift-and-add upsample
    (``ops.image_warp.upsample_bilinear_phased``) by 2.4× inside the solver
    — the phase interleave is a sublane relayout the TPU pays for dearly,
    while the MXU matmul pipelines cleanly with the surrounding fusion.
    """
    from ..ops.image_warp import resize_matrix

    gh, gw = field.shape[-2:]
    ph = int(grid.patch_size[0] / 2 // grid.stride[0]) + 1
    pw = int(grid.patch_size[1] / 2 // grid.stride[1]) + 1
    out_h, out_w = out_size or grid.image_size
    widths = [(0, 0)] * (field.ndim - 2) + [(ph, ph), (pw, pw)]
    padded = jnp.pad(field, widths, mode="edge")
    up_h = (gh + 2 * ph) * grid.stride[0]
    up_w = (gw + 2 * pw) * grid.stride[1]
    h1 = up_h // 2 - out_h // 2
    w1 = up_w // 2 - out_w // 2
    x0, x1, y0, y1 = crop if crop is not None else (0, out_h, 0, out_w)
    mh = resize_matrix(gh + 2 * ph, up_h, padded.dtype)[h1 + x0:h1 + x1]
    mw = resize_matrix(gw + 2 * pw, up_w, padded.dtype)[w1 + y0:w1 + y1]
    out = jnp.einsum("oh,...hw->...ow", mh, padded,
                     preferred_element_type=padded.dtype)
    return jnp.einsum("pw,...ow->...op", mw, out,
                      preferred_element_type=padded.dtype)


def patch_flow_of(params: jax.Array, spec: GenerativeSpec) -> jax.Array:
    """Per-patch flow ``[2, gh, gw]`` from the joint parameter field."""
    if spec.poisson_model:
        return poisson_to_flow(params[0], ksize=spec.sobel_ksize)
    if spec.angle_model:
        return jnp.stack([jnp.sin(params[0]), jnp.cos(params[0])])
    return params[:2]


def patch_to_dense_indexed(
    field: jax.Array, grid: PatchGrid,
    row_idx, col_idx,
) -> jax.Array:
    """:func:`patch_to_dense` evaluated only at the given (static) image
    rows × cols — the decimated-grid variant used by the outside-ROI
    prediction-norm correction.  ``row_idx`` / ``col_idx`` are host-side
    integer arrays (trace-static), so the interpolation matrices are sliced
    to exactly those output positions."""
    import numpy as np

    from ..ops.image_warp import resize_matrix

    gh, gw = field.shape[-2:]
    ph = int(grid.patch_size[0] / 2 // grid.stride[0]) + 1
    pw = int(grid.patch_size[1] / 2 // grid.stride[1]) + 1
    out_h, out_w = grid.image_size
    widths = [(0, 0)] * (field.ndim - 2) + [(ph, ph), (pw, pw)]
    padded = jnp.pad(field, widths, mode="edge")
    up_h = (gh + 2 * ph) * grid.stride[0]
    up_w = (gw + 2 * pw) * grid.stride[1]
    h1 = up_h // 2 - out_h // 2
    w1 = up_w // 2 - out_w // 2
    mh = resize_matrix(gh + 2 * ph, up_h, padded.dtype)[
        h1 + np.asarray(row_idx)]
    mw = resize_matrix(gw + 2 * pw, up_w, padded.dtype)[
        w1 + np.asarray(col_idx)]
    out = jnp.einsum("oh,...hw->...ow", mh, padded,
                     preferred_element_type=padded.dtype)
    return jnp.einsum("pw,...ow->...op", mw, out,
                      preferred_element_type=padded.dtype)


def outside_norm_sq(patch_flow: jax.Array, grid: PatchGrid,
                    spec: GenerativeSpec, strips) -> jax.Array:
    """Squared prediction-norm contribution of the region outside the ROI
    box, estimated on decimated sample grids.

    Each strip is ``(row_idx, col_idx, gxx, gxy, gyy, area_per_sample)``
    with ``g**`` the frame-gradient products at those pixels (constants,
    hoisted out of the optimizer scan by XLA; rectangles sharing rows —
    e.g. the left+right flanks of a full-height ROI — arrive merged into
    one sample grid, see ``..pyramid._outside_strips``).  The prediction
    there is approximated as the *unwarped* generative model ``flow·∇I`` —
    the pattern-shift warp (|pxy| ≤ 0.4 px) redistributes the gradient
    field but barely changes its regional energy, and only the scalar norm
    is needed — so ``Σ pred²`` is evaluated as the quadratic form
    ``fx²·gx² + 2·fx·fy·gx·gy + fy²·gy²`` in the interpolated flow."""
    if spec.compute_dtype is not None:
        patch_flow = patch_flow.astype(spec.compute_dtype)
    acc = jnp.float32 if patch_flow.dtype == jnp.bfloat16 else patch_flow.dtype
    total = jnp.zeros((), acc)
    for row_idx, col_idx, gxx, gxy, gyy, area in strips:
        f = patch_to_dense_indexed(patch_flow, grid, row_idx, col_idx)
        q = (f[0] * f[0] * gxx + 2.0 * f[0] * f[1] * gxy
             + f[1] * f[1] * gyy)
        total = total + area * jnp.sum(q.astype(acc))
    return total


def params_to_fields(
    params: jax.Array, grid: PatchGrid, spec: GenerativeSpec,
    crop: Optional[Tuple[int, int, int, int]] = None,
    patch_flow: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Unfold the joint parameter field ``[n_dim, gh, gw]`` to dense fields.

    Returns dict with ``flow`` ``[2, H, W]``, plus ``pxy`` (if optimize_warp)
    and ``intensity`` (if poisson_model).

    Parity: ``PatchEkltPyramid2._get_patch_flow/_get_patch_translation/
    _get_patch_poisson`` + the dense interpolation
    (``patch_eklt_pyramid2.py:291-327``, ``patch_eklt_dependent.py:178-257``).
    """
    if patch_flow is None:
        patch_flow = patch_flow_of(params, spec)

    # Fuse all per-patch fields into ONE dense interpolation (a single pair
    # of resize matmuls instead of one per field) — same numerics, ~2-3×
    # fewer MXU launches in the optimization hot loop.
    fields = [patch_flow]
    names = ["flow"]
    if spec.optimize_warp:
        fields.append(params[-2:])
        names.append("pxy")
    if spec.poisson_model and spec.needs_intensity:
        fields.append(params[0:1])
        names.append("intensity")
    stacked = jnp.concatenate(fields, axis=0)
    if spec.compute_dtype is not None:
        stacked = stacked.astype(spec.compute_dtype)
    dense = patch_to_dense(stacked, grid, crop=crop)
    out: Dict[str, jax.Array] = {}
    pos = 0
    for name, f in zip(names, fields):
        n = f.shape[0]
        out[name] = dense[pos:pos + n] if n > 1 else dense[pos]
        pos += n
    return out


# ---------------------------------------------------------------------------
# Prediction side
# ---------------------------------------------------------------------------

def predict_increment(
    flow: jax.Array,
    gx: jax.Array,
    gy: jax.Array,
    spec: GenerativeSpec,
    pxy: Optional[jax.Array] = None,
    weights: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    extra_norm_sq: Optional[jax.Array] = None,
) -> jax.Array:
    """Generative model: predicted brightness increment ``v·∇I``.

    ``pxy`` (dense per-pixel translation) warps the gradients before the dot
    product — the background-pattern distortion term.  Normalized by its L2
    norm (+eps) and optionally masked.  ``extra_norm_sq`` adds squared norm
    contributions from outside the computed domain (the exact-ROI fast
    path's correction, :func:`outside_norm_sq`) so the normalizer keeps the
    full-frame semantics of ``gml:486``.

    Parity: ``PatchEkltPyramid2._make_prediction_torch``
    (``patch_eklt_pyramid2.py:345-365``).
    """
    if spec.optimize_warp and pxy is not None:
        if spec.warp_stencil_radius > 0:
            stack = jnp.stack([gx, gy])
            if spec.warp_compute_bf16:
                gxy = warp_image_stencil(
                    stack.astype(jnp.bfloat16), pxy.astype(jnp.bfloat16),
                    spec.warp_stencil_radius).astype(stack.dtype)
            else:
                gxy = warp_image_stencil(stack, pxy,
                                         spec.warp_stencil_radius)
            gx, gy = gxy[0], gxy[1]
        else:
            gx = warp_image_forward(gx, pxy)
            gy = warp_image_forward(gy, pxy)
    pred = flow[0] * gx + flow[1] * gy
    if spec.no_polarity:
        pred = jnp.abs(pred)
    if weights is not None:
        pred = pred * weights
    if extra_norm_sq is not None:
        # same zero-subgradient guard as _safe_frobenius: the plain
        # velocity model initializes the prediction at exactly zero, and
        # the stride-decimated outside correction is then zero too —
        # sqrt(0) would back-propagate NaN from iteration 0
        acc = jnp.float32 if pred.dtype == jnp.bfloat16 else pred.dtype
        sq = (jnp.sum((pred * pred).astype(acc))
              + extra_norm_sq.astype(acc))
        zero = sq == 0
        nrm = jnp.where(zero, 0.0,
                        jnp.sqrt(jnp.where(zero, 1.0, sq))).astype(pred.dtype)
    else:
        nrm = _safe_frobenius(pred)
    pred = pred / (nrm + NORM_EPS)
    if mask is not None:
        pred = pred * mask
    return pred


# ---------------------------------------------------------------------------
# Objectives
# ---------------------------------------------------------------------------

def dense_objective(
    params: jax.Array,
    measured: jax.Array,
    gx: jax.Array,
    gy: jax.Array,
    weight_inverse: jax.Array,
    mask: jax.Array,
    grid: PatchGrid,
    spec: GenerativeSpec,
    weights: Optional[jax.Array] = None,
    roi_crop: Optional[Tuple[int, int, int, int]] = None,
    norm_strips=None,
):
    """Full-image joint objective over the ``[n_dim, gh, gw]`` parameter field.

    Parity: ``PatchEkltPyramid2._objective_scipy``
    (``patch_eklt_pyramid2.py:368-397``): hybrid cost of prediction vs
    measurement with the masked flow / pxy / intensity terms.
    Returns ``(loss, per-term dict)``.

    With ``roi_crop`` all dense fields (and the supplied constant images,
    which the caller must pre-crop) cover only the margin-expanded ROI box —
    ~2× less dense work for the benchmark ROI.  The caller
    (:func:`..pyramid.solve_pyramid`) preserves full-frame cost semantics:
    the measurement keeps its full-frame normalization, H·W-mean terms
    carry area-rescaled weights (TV/charbonnier restore full-frame values
    via ``arg["full_domain"]`` instead), and the mask ridge stays inside
    the box.
    Only the prediction L2 normalizer runs over the box instead of the
    frame (``restrict_to_roi`` docstring discusses why this is benign).
    """
    patch_flow = patch_flow_of(params, spec)
    fields = params_to_fields(params, grid, spec, crop=roi_crop,
                              patch_flow=patch_flow)
    extra = (outside_norm_sq(patch_flow, grid, spec, norm_strips)
             if norm_strips else None)
    pred = predict_increment(
        fields["flow"], gx, gy, spec, fields.get("pxy"), weights, mask,
        extra_norm_sq=extra)
    arg = {
        "prediction": pred,
        "measurement": measured,
        "flow": fields["flow"] * mask,
        "weights": weight_inverse,
        "omit_boundary": True,
    }
    if roi_crop is not None:
        # total_variation / charbonnier restore full-frame normalization
        # from the cropped fields in closed form (costs.py docstrings);
        # the H·W-mean costs are handled by area-rescaled weights instead
        arg["full_domain"] = spec.image_size
    if "pxy" in fields:
        arg["pxy"] = fields["pxy"] * mask
    if "intensity" in fields:
        arg["intensity"] = fields["intensity"] * mask
    return spec.cost_fn()(arg)


def scalar_param_dim(spec: GenerativeSpec) -> int:
    return spec.param_dim


def unfold_scalar_params(theta: jax.Array, spec: GenerativeSpec):
    """Scalar parameter vector → (v_x, v_y, p_x, p_y | None).

    Parity: ``gml.unfold_params`` (``gml:144-161``) — angle model maps
    ``angle → (sin, cos)``; with ``pxpy_as_anglemagn`` the warp pair is
    ``(p_magn, p_angle) → (magn·sin, magn·cos)`` (``gml:155-156,174-175``);
    poisson model has no meaning for a single scalar velocity and is treated
    as the plain (vx, vy) model in the whole-ROI solver.
    """
    if spec.angle_model:
        vx, vy = jnp.sin(theta[0]), jnp.cos(theta[0])
        rest = theta[1:]
    else:
        vx, vy = theta[0], theta[1]
        rest = theta[2:]
    if spec.optimize_warp:
        if spec.pxpy_as_anglemagn:
            pxy = (rest[0] * jnp.sin(rest[1]), rest[0] * jnp.cos(rest[1]))
        else:
            pxy = (rest[0], rest[1])
    else:
        pxy = None
    return vx, vy, pxy


def scalar_prediction(
    theta: jax.Array,
    gx: jax.Array,
    gy: jax.Array,
    roi: Tuple[int, int, int, int],
    spec: GenerativeSpec,
    weights_roi: Optional[jax.Array] = None,
):
    """Normalized whole-ROI prediction for a scalar parameter vector.

    The prediction half of :func:`scalar_objective`
    (``gml._make_prediction_torch``, ``gml:459-487``), shared with the DEBUG
    evolution renderer so the video shows exactly what the optimizer saw.
    Returns ``(pred_roi, (vx, vy, pxy))``.
    """
    x0, x1, y0, y1 = roi
    vx, vy, pxy = unfold_scalar_params(theta, spec)
    if pxy is not None:
        shift = jnp.stack([pxy[0], pxy[1]])
        if spec.warp_stencil_radius > 0:
            gxw = warp_image_stencil(gx, shift, spec.warp_stencil_radius)[x0:x1, y0:y1]
            gyw = warp_image_stencil(gy, shift, spec.warp_stencil_radius)[x0:x1, y0:y1]
        else:
            gxw = warp_image_shift(gx, shift)[x0:x1, y0:y1]
            gyw = warp_image_shift(gy, shift)[x0:x1, y0:y1]
    else:
        gxw = gx[x0:x1, y0:y1]
        gyw = gy[x0:x1, y0:y1]
    pred = vx * gxw + vy * gyw
    if spec.no_polarity:
        pred = jnp.abs(pred)
    if weights_roi is not None:
        pred = pred * weights_roi
    pred = pred / (_safe_frobenius(pred) + NORM_EPS)
    return pred, (vx, vy, pxy)


def scalar_objective(
    theta: jax.Array,
    measured_roi: jax.Array,
    gx: jax.Array,
    gy: jax.Array,
    weight_inverse: jax.Array,
    roi: Tuple[int, int, int, int],
    spec: GenerativeSpec,
    weights_roi: Optional[jax.Array] = None,
):
    """Whole-ROI objective over 1-4 scalar parameters.

    Parity: ``GenerativeMaximumLikelihood._objective_scipy`` +
    ``_make_prediction_torch`` (``gml:343-373``, ``459-487``): the full-size
    gradients are globally shifted by (p_x, p_y), cropped to the ROI, dotted
    with the constant velocity, L2-normalized; cost sees the constant flow
    field and translation over the ROI.
    """
    x0, x1, y0, y1 = roi
    pred, (vx, vy, pxy) = scalar_prediction(theta, gx, gy, roi, spec,
                                            weights_roi)

    roi_shape = (x1 - x0, y1 - y0)
    flow = jnp.broadcast_to(jnp.stack([vx, vy])[:, None, None], (2,) + roi_shape)
    wi_roi = weight_inverse[x0:x1, y0:y1]
    arg = {
        "prediction": pred,
        "measurement": measured_roi,
        "flow": flow,
        "weights": wi_roi,
        "omit_boundary": True,
    }
    if pxy is not None:
        arg["pxy"] = jnp.broadcast_to(
            jnp.stack([pxy[0], pxy[1]])[:, None, None], (2,) + roi_shape)
    return spec.cost_fn()(arg)


def initialize_params(
    key: jax.Array, grid_shape: Tuple[int, int], spec: GenerativeSpec
) -> jax.Array:
    """Initial joint parameter field ``[n_dim, gh, gw]``.

    Parity: ``gml._initialize_velocity`` (``gml:425-450``) per patch —
    poisson base ~ U(−1, 1) (independent per patch, as the reference draws a
    fresh sample per patch in ``pyramid2:246``), angle = π, velocities and
    translations zero.
    """
    gh, gw = grid_shape
    n = spec.param_dim
    params = jnp.zeros((n, gh, gw), spec.dtype)
    if spec.poisson_model:
        base = jax.random.uniform(key, (gh, gw), spec.dtype, -1.0, 1.0)
        params = params.at[0].set(base)
    elif spec.angle_model:
        params = params.at[0].set(jnp.pi)
    return params
