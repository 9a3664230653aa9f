"""Pyramidal (coarse-to-fine) joint patch solver — the flagship model.

TPU-native re-design of ``PatchEkltPyramid2``
(``src/solver/patch_eklt_pyramid2.py``), the solver shipped in the benchmark
config (``configs/hot_plate1.yaml:44``).  The reference runs a Python/torch
optimizer loop per pyramid scale (600 iterations split over 4 scales); here
each scale is one ``lax.scan`` over optax Adam steps, jitted end-to-end with
the IWE cache and frame gradients, so a whole per-frame solve is a handful of
device launches with zero host round-trips.

Scale schedule parity (``patch_eklt_pyramid2.py:55-83``): square patches of
size 64 → 8 halving per scale, patch == stride (no overlap), per-scale
iterations ``n_iter // (n_scales - scale_index + 1)``
(``patch_eklt_pyramid2.py:260``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gradients import frame_gradients, poisson_to_flow
from ..ops.image_warp import resize_bilinear
from ..optim import run_first_order
from ..types import Events, PatchGrid
from .generative import (
    GenerativeSpec,
    dense_objective,
    iwe_cache,
    measured_increment,
    patch_to_dense,
    initialize_params,
)

__all__ = ["PyramidSpec", "pyramid_grids", "scale_iterations", "solve_pyramid",
           "estimate_frame", "roi_mask", "update_coarse_from_fine"]


@dataclasses.dataclass(frozen=True)
class PyramidSpec:
    """Static pyramid-solver configuration (jit-static)."""

    gen: GenerativeSpec
    roi: Tuple[int, int, int, int]  # xmin, xmax, ymin, ymax
    coarsest_patch: int = 64
    finest_patch: int = 8
    n_iter: int = 600
    method: str = "Adam"
    lr: float = 0.05
    lr_decay: float = 0.1
    offset: Tuple[int, int] = (0, 0)
    track_best: bool = True
    # Opt-in speed mode: evaluate the objective only on the ROI box expanded
    # by ``roi_margin`` (~2x less dense work for the benchmark ROI) while
    # preserving the full-frame cost semantics exactly for every cost term
    # (see the restricted branch in :func:`solve_pyramid`):
    #   * the measurement keeps its full-frame L2 normalization,
    #   * mean-based cost terms are rescaled by box/full area so their
    #     full-frame mean divisors are preserved,
    #   * the ROI mask ridge stays inside the box, so the boundary
    #     total-variation contributions survive,
    #   * the induced-1-norm diff cost is exactly invariant to the crop
    #     (all-zero columns/rows cannot change a max-abs-column-sum).
    # The one remaining approximation is the *prediction* L2-normalization
    # domain (box instead of full frame, ``gml:486``); its out-of-box part
    # is the flow·∇I energy of masked-out patches, which only rescales the
    # normalized prediction (the fit is scale-invariant in the flow).
    restrict_to_roi: bool = False
    # Pixels of context kept around the ROI in restricted mode (≥ 2 keeps
    # every nonzero term of the masked costs inside the box).
    roi_margin: int = 2
    # Sampling stride of the outside-box prediction-norm correction
    # (:func:`..generative.outside_norm_sq`); 0 disables the correction
    # (box-only normalizer — the round-2 approximation).  Measured: stride 1
    # reproduces the full-frame loss to 2e-7 at iteration 0 (64×96 scene);
    # at the 720×1280 benchmark, stride 4 matches the parity solve's
    # EPE-over-seeds distribution (0.220±0.029 vs 0.222±0.036, 8 seeds) at
    # 128.8 vs 184.3 ms/frame.
    roi_norm_stride: int = 4
    # DEBUG observability: > 0 records the parameter iterate every
    # ``record_evolution`` steps into ``aux["params_history"]`` so the host
    # can render per-iteration prediction/measurement videos (the
    # ``LossVideosMaker`` / ``visualize_evolution`` analogue,
    # ``generative_max_likelihood.py:39-82``,
    # ``patch_eklt_dependent.py:139-176``).
    record_evolution: int = 0
    # Quality mode: > 1 vmaps the whole pyramid solve over that many random
    # restarts (the poisson base init is random, ``gml:425-450``) and keeps
    # the restart with the lowest finest-scale loss — a multi-start the
    # reference cannot afford on CPU.  Measured on the synthetic benchmark
    # scene (720×1280): single-start EPE varies 0.16–0.26 px with the init
    # seed; best-loss selection over 8 restarts lands 0.17–0.22 px
    # (loss↔EPE correlation is real but loose).  Prefer spreading restarts
    # across chips via parallel.sweep / the mesh CLI mode when available.
    n_restarts: int = 1
    # How single-chip restart lanes execute.  "map" (default) runs them
    # sequentially via ``lax.map`` — each lane keeps the single-solve fusion
    # layout, so R restarts cost ~R× one solve.  "vmap" batches the lanes;
    # measured 19× for R=8 at the benchmark scale (batching breaks the
    # fused VPU layout of the stencil warp), kept only for A/B probing.
    restart_mode: str = "map"

    @property
    def n_scales(self) -> int:
        return int(math.log2(self.coarsest_patch / self.finest_patch)) + 1


def pyramid_grids(spec: PyramidSpec) -> List[PatchGrid]:
    """Patch grids coarsest → finest (patch == stride at every scale)."""
    grids = []
    for i in range(spec.n_scales):
        p = spec.coarsest_patch // (2**i)
        grids.append(
            PatchGrid(spec.gen.image_size, (p, p), (p, p), spec.offset)
        )
    return grids


def scale_iterations(spec: PyramidSpec) -> List[int]:
    """Per-scale iteration budget (``patch_eklt_pyramid2.py:260``)."""
    s = spec.n_scales
    return [spec.n_iter // (s - i + 1) for i in range(s)]


def roi_mask(spec: PyramidSpec, dtype=None) -> np.ndarray:
    """Dense {0,1} estimation mask over the ROI
    (``patch_eklt_pyramid2.py:51-52``)."""
    dtype = dtype or spec.gen.dtype
    x0, x1, y0, y1 = spec.roi
    m = np.zeros(spec.gen.image_size, np.asarray(0, dtype).dtype)
    m[x0:x1, y0:y1] = 1
    return m


def _outside_strips(box, gx, gy, gen, stride, weights=None):
    """Decimated sample grids covering the frame outside ``box``.

    Decomposes frame∖box into ≤ 4 rectangles (top/bottom full-width, left/
    right between them), samples each at ``stride`` in both axes (centered
    offset), and precomputes the gradient products consumed by
    :func:`..generative.outside_norm_sq`.  ``weights`` (the event-hist
    weight map, when ``weight_by_event_hist`` is on) multiplies the
    prediction *before* its norm (``predict_increment``), so it folds into
    the products as w².  All constants — computed once per jitted solve,
    hoisted out of the optimizer scan by XLA."""
    if not stride:
        return None
    h, w = gen.image_size
    x0, x1, y0, y1 = box
    # the left/right flanks share rows — merge their columns into ONE sample
    # grid so each optimizer iteration pays a single pair of interpolation
    # matmuls for the correction (measured: unmerged strips cost ~2× in
    # launch/fusion overhead); the area weight becomes the uniform stride²
    # per sample (edge effects O(stride·perimeter), negligible vs the norm)
    rects = [(0, x0, [(0, w)]), (x1, h, [(0, w)]),
             (x0, x1, [(0, y0), (y1, w)])]
    strips = []
    dt = gen.compute_dtype or gen.dtype
    area = jnp.asarray(float(stride * stride), dt)
    for r0, r1, cols in rects:
        ridx = np.arange(r0 + stride // 2, r1, stride)
        cidx = np.concatenate([np.arange(c0 + stride // 2, c1, stride)
                               for c0, c1 in cols]) if cols else np.zeros(0, int)
        if len(ridx) == 0 or len(cidx) == 0:
            continue
        gxs = gx[np.ix_(ridx, cidx)].astype(dt)
        gys = gy[np.ix_(ridx, cidx)].astype(dt)
        if weights is not None:
            ws = weights[np.ix_(ridx, cidx)].astype(dt)
            gxs = gxs * ws
            gys = gys * ws
        strips.append((ridx, cidx, gxs * gxs, gxs * gys, gys * gys, area))
    return strips or None


def solve_pyramid(
    histogram: jax.Array,
    weights: Optional[jax.Array],
    weight_inverse: jax.Array,
    gx: jax.Array,
    gy: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    spec: PyramidSpec,
    prev_params: Optional[List[jax.Array]] = None,
    init_params: Optional[jax.Array] = None,
    lr: Optional[jax.Array] = None,
):
    """Coarse-to-fine joint optimization; returns (dense_flow, aux).

    ``lr`` optionally overrides ``spec.lr`` with a *traced* value — enabling
    vmapped hyper-parameter sweeps (see ``parallel.sweep``).

    ``aux`` carries per-scale best parameter fields, loss histories and
    per-term cost histories (the JAX-native ``cost_func.get_history()``).

    Warm-start parity (``patch_eklt_pyramid2.py:234-251``): with
    ``prev_params`` the coarsest scale starts from the previous frame's
    params and finer scales average the upsampled coarser result with the
    previous frame's same-scale params; otherwise the coarser result is
    upsampled as-is and the coarsest scale starts from
    :func:`initialize_params`.
    """
    gen = spec.gen
    measured = measured_increment(histogram, weights) * mask
    grids = pyramid_grids(spec)
    iters = scale_iterations(spec)

    roi_crop = None
    norm_strips = None
    gx_o, gy_o, wi_o, mask_o, weights_o = gx, gy, weight_inverse, mask, weights
    if spec.restrict_to_roi:
        # Exact-ROI fast path: crop to the margin-expanded ROI box.  The
        # measurement above is already normalized over the FULL frame
        # (``measured_increment`` runs before this crop), the mask keeps its
        # ridge inside the box (margin ≥ 2 ⇒ every nonzero |∇(flow·mask)|
        # term is inside), and mean-based cost terms are rescaled below so
        # their full-frame mean divisor is preserved.
        h, w_ = gen.image_size
        mrg = spec.roi_margin
        roi_crop = (max(0, spec.roi[0] - mrg), min(h, spec.roi[1] + mrg),
                    max(0, spec.roi[2] - mrg), min(w_, spec.roi[3] + mrg))
        x0, x1, y0, y1 = roi_crop
        measured = measured[x0:x1, y0:y1]
        gx = gx[x0:x1, y0:y1]
        gy = gy[x0:x1, y0:y1]
        mask = mask[x0:x1, y0:y1]
        weight_inverse = weight_inverse[x0:x1, y0:y1]
        weights = None if weights is None else weights[x0:x1, y0:y1]
        # H·W-mean cost terms divide by the domain area; rescale so a
        # box-domain mean reproduces the full-frame mean.  Every summand
        # of these terms is supported inside the margin box (flow and pxy
        # are masked, the mask ridge is inside), so
        # full-frame mean == box mean × area_scale exactly: numeric
        # weights absorb the factor, "inv" weights become
        # 1 / (raw · area_scale) via the ("inv", s) weight form.
        # total_variation and charbonnier are NOT in this set: TV's two
        # means use (H-1)·W and H·(W-1) divisors (no single factor fits
        # both) and charbonnier's summand has a nonzero ε^{2α} floor at
        # every out-of-box pixel — both instead restore full-frame
        # semantics in closed form via arg["full_domain"]
        # (``dense_objective`` below, ``costs.py``).
        area_scale = ((x1 - x0) * (y1 - y0)) / float(h * w_)
        _mean_costs = {"image_gradient", "flow_norm", "flow_norm_pxy"}

        def _rescale(n, w):
            if n not in _mean_costs:
                return w
            if w == "inv":
                return ("inv", area_scale)
            return w if isinstance(w, str) else w * area_scale

        gen = dataclasses.replace(gen, cost_weights=tuple(
            (n, _rescale(n, w)) for n, w in gen.cost_weights))
        norm_strips = _outside_strips(roi_crop, gx_o, gy_o, gen,
                                      spec.roi_norm_stride,
                                      weights=weights_o)

    if gen.compute_dtype is not None:
        # cast the optimization-loop constants once; params/optimizer state
        # stay in gen.dtype (grads are cast back by autodiff)
        cd = gen.compute_dtype
        measured = measured.astype(cd)
        gx = gx.astype(cd)
        gy = gy.astype(cd)
        mask = mask.astype(cd)
        weight_inverse = weight_inverse.astype(cd)
        weights = None if weights is None else weights.astype(cd)

    params_per_scale: List[jax.Array] = []
    histories: List[jax.Array] = []
    term_histories: List[Dict[str, jax.Array]] = []
    evolution: List[jax.Array] = []
    params = None
    for i, (grid, n_it) in enumerate(zip(grids, iters)):
        gshape = grid.shape
        if i == 0:
            if init_params is not None:
                x0 = init_params
            elif prev_params is not None:
                x0 = prev_params[0]
            else:
                x0 = initialize_params(key, gshape, gen)
        else:
            x0 = resize_bilinear(params, gshape)
            if prev_params is not None:
                x0 = (prev_params[i] + x0) / 2.0

        def objective(p, _grid=grid):
            return dense_objective(
                p, measured, gx, gy, weight_inverse, mask, _grid, gen,
                weights=weights, roi_crop=roi_crop, norm_strips=norm_strips)

        result = run_first_order(
            objective, x0, n_it, method=spec.method,
            lr=spec.lr if lr is None else lr,
            lr_decay=spec.lr_decay, track_best=spec.track_best, has_aux=True,
            record_every=spec.record_evolution)
        params = result.param
        params_per_scale.append(params)
        histories.append(result.history)
        term_histories.append(result.aux_history)
        if spec.record_evolution > 0:
            evolution.append(result.params_history)

    if gen.poisson_model:
        patch_flow = poisson_to_flow(params[0], ksize=gen.sobel_ksize)
    elif gen.angle_model:
        patch_flow = jnp.stack([jnp.sin(params[0]), jnp.cos(params[0])])
    else:
        patch_flow = params[:2]
    # select (not multiply) so outside-ROI pixels are exactly +0.0: the
    # facade's cropped flow fetch (``facades.py``) reconstructs them with
    # ``np.zeros`` on host, and ``x * 0.0`` would leave −0.0 where the
    # unmasked interpolation is negative — breaking the reconstruction's
    # bitwise-identity contract (values inside the mask are unchanged:
    # the mask is {0,1} and ``x * 1.0`` was already exact)
    dense_flow = jnp.where(mask_o != 0,
                           patch_to_dense(patch_flow, grids[-1]), 0.0)

    aux = {
        "params_per_scale": params_per_scale,
        "loss_history": histories,
        "term_history": term_histories,
    }
    if spec.record_evolution > 0:
        aux["params_history"] = evolution
    if gen.optimize_warp:
        aux["pxy"] = patch_to_dense(params[-2:], grids[-1]) * mask_o
    return dense_flow, aux


def estimate_frame(
    ev: Events,
    frame: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    spec: PyramidSpec,
    prev_params: Optional[List[jax.Array]] = None,
    init_params: Optional[jax.Array] = None,
    lr: Optional[jax.Array] = None,
    cache: Optional[Tuple[jax.Array, ...]] = None,
):
    """Whole per-frame solve: gradients + IWE cache + pyramid optimization.

    This is the function to ``jax.jit`` (everything inside is shape-static
    for a fixed event capacity).  Mirrors ``PatchEkltPyramid2.estimate``
    (``patch_eklt_pyramid2.py:134-191``) minus host-side visualization.

    ``cache`` optionally supplies a precomputed IWE cache — the
    ``(histogram, weights, weight_inverse)`` triple of
    :func:`.generative.iwe_cache` / :func:`iwe_cache_program` — in which
    case the events are unused (XLA drops the dead input).  The events
    enter the solve ONLY through this once-per-frame constant
    (SURVEY.md §3.2), so splitting the cache into its own pre-dispatched
    device program is semantically free; it is where the Pallas hat-matmul
    vote kernel's isolated 3.4× win is real (the same kernel *embedded*
    in this program measures slower — ``docs/performance.md`` §micro).
    """
    gen = spec.gen
    frame = frame.astype(gen.dtype)
    gx, gy = frame_gradients(frame, ksize=gen.sobel_ksize,
                             use_log_intensity=gen.use_log_intensity)
    hist, weights, weight_inverse = (cache if cache is not None
                                     else iwe_cache(ev, gen))
    if spec.n_restarts > 1 and init_params is None and prev_params is None:
        # Multi-start quality mode: run the solve over R restart keys, keep
        # the restart whose finest scale reached the lowest loss (the IWE
        # cache and gradients are computed once and shared).  Only the
        # random cold-start init differs between restarts, so the branch is
        # skipped when a warm start (prev_params) or explicit init pins the
        # trajectory — R identical solves would cost R× for nothing (the
        # facade rejects warm_start+n_restarts configs up front).
        #
        # ``restart_mode`` picks the execution strategy: sequential
        # ``lax.map`` keeps each lane on the single-solve fused layout
        # (~R× one solve), while ``vmap`` batches the lanes and measures
        # ~2.4× worse at the benchmark scale (docs/performance.md
        # §accuracy headroom).
        keys = jax.random.split(key, spec.n_restarts)
        lane = lambda k: solve_pyramid(hist, weights, weight_inverse,  # noqa: E731
                                       gx, gy, mask, k, spec, lr=lr)
        if spec.restart_mode == "vmap":
            flows, auxes = jax.vmap(lane)(keys)
        elif spec.restart_mode == "map":
            flows, auxes = jax.lax.map(lane, keys)
        else:
            raise ValueError(
                f"restart_mode must be 'map' or 'vmap', got "
                f"{spec.restart_mode!r}")
        final_hist = auxes["loss_history"][-1]  # [R, n_iter of finest scale]
        # selection metric must match what each restart *returns*: the
        # best-loss iterate under track_best, the final iterate otherwise
        score = (jnp.min(final_hist, axis=-1) if spec.track_best
                 else final_hist[:, -1])
        best = jnp.argmin(score)
        flow = jax.tree_util.tree_map(lambda x: x[best], flows)
        aux = jax.tree_util.tree_map(lambda x: x[best], auxes)
        return flow, aux
    return solve_pyramid(hist, weights, weight_inverse, gx, gy, mask, key,
                         spec, prev_params, init_params, lr=lr)


def update_coarse_from_fine(
    params_per_scale: List[jax.Array], spec: PyramidSpec
) -> List[jax.Array]:
    """Downsample fine-scale params back onto coarser grids (feedback for
    next-frame warm starts; ``patch_eklt_pyramid2.py:439-458``)."""
    grids = pyramid_grids(spec)
    refined = [None] * len(params_per_scale)
    refined[-1] = params_per_scale[-1]
    for i in range(len(params_per_scale) - 1, 0, -1):
        refined[i - 1] = resize_bilinear(params_per_scale[i], grids[i - 1].shape)
    return refined
