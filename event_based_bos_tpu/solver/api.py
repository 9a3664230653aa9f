"""User-facing solver classes (reference-compatible facade).

The reference exposes solvers as classes constructed from the YAML config
(``src/solver/base.py:64-106``); this module provides the same constructor
signature and public methods (``preprocess`` / ``estimate`` /
``calculate_flow_error`` / ``calculate_fwl`` / ``save_flow_error_as_text`` /
``visualize_*``) on top of the functional jitted estimators.  Each facade
owns a cache of jitted per-frame solvers keyed by the padded event capacity
(power-of-two buckets → a handful of compiles per run).

Flow-output convention: ``reference`` (default) returns exactly what the
upstream code returns; ``physical`` negates the generative-model flow so it
equals the pattern displacement in (row, col) — see ``docs/conventions.md``.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.filters import EventFilter
from ..ops.flow import calculate_flow_error
from ..ops.iwe import create_eventmask, create_image_from_events
from ..ops.warp import warp_event
from ..types import Events, events_from_ndarray
from ..costs import normalized_image_variance
from .generative import GenerativeSpec
from .gml import GmlSpec, estimate_frame_gml, make_host_tpe_solver
from .patch import PatchSpec, estimate_frame_dependent, estimate_frame_patch
from .pyramid import PyramidSpec, estimate_frame, roi_mask

logger = logging.getLogger(__name__)


from ..types import bucket_capacity as _bucket_capacity


def _clipped_iwe(ev: Events, image_shape, max_scale: jax.Array) -> jax.Array:
    """IWE render → inverted clipped uint8 — matches the host formula
    bit-for-bit: clip → truncating uint8 cast → inversion (255 − x).
    Shared by the single-call jit and the fused render bundle."""
    im = create_image_from_events(ev, image_shape, sigma=0)
    return 255 - jnp.clip(max_scale * im, 0, 255).astype(jnp.uint8)


@functools.lru_cache(maxsize=None)
def _jit_clipped_iwe(image_shape):
    """Jitted IWE render → inverted uint8 (the eager per-primitive dispatch
    of this many-op program costs seconds per frame over the remote-TPU
    tunnel; jitted it is one dispatch and a small uint8 fetch)."""
    return jax.jit(lambda ev, max_scale: _clipped_iwe(ev, image_shape,
                                                      max_scale))


@functools.lru_cache(maxsize=None)
def _jit_eventmask(image_shape):
    return jax.jit(lambda ev: create_eventmask(ev, image_shape))


def _fwl(ev: Events, flow: jax.Array, image_shape,
         normalize_t: bool) -> jax.Array:
    iwe_orig = create_image_from_events(ev, image_shape, sigma=1)
    warped = warp_event(ev, flow, "dense-flow", direction="middle",
                        normalize_t=normalize_t)
    iwe = create_image_from_events(warped, image_shape, sigma=1)
    return normalized_image_variance({"orig_iwe": iwe_orig, "iwe": iwe})


@functools.lru_cache(maxsize=None)
def _jit_fwl(image_shape, normalize_t: bool):
    def f(ev: Events, flow: jax.Array) -> jax.Array:
        return _fwl(ev, flow, image_shape, normalize_t)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _jit_fwl_device(image_shape, normalize_t: bool, dtype):
    """FWL from the solve's device-resident UNORIENTED flow: ``scale``
    folds the GT-window time rescale and the output-orientation sign on
    device (see :meth:`SolverBase.calculate_fwl_async`)."""
    def f(ev: Events, est, scale: jax.Array) -> jax.Array:
        flow = (est.astype(jnp.float32) * scale).astype(dtype)
        return _fwl(ev, flow, image_shape, normalize_t)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _jit_flow_error(masked: bool):
    def f(gt, pred, mask):
        return calculate_flow_error(gt, pred, event_mask=mask)

    if masked:
        return jax.jit(f)
    return jax.jit(lambda gt, pred: calculate_flow_error(gt, pred))


@functools.lru_cache(maxsize=None)
def _jit_render_bundle(image_shape, err_crop=None):
    """All per-frame visualization device work in ONE program: clipped IWE,
    event mask, both Poisson-integration views, the HSV-polar planes of
    both flows, and (with ``err_crop``) both flow-error dicts (each extra
    dispatch costs a full round trip over a remote-device link).  The
    Poisson views are shape-agnostic (non-CLI callers may pass crop-shaped
    flows; ``err_crop`` requires the full-frame shapes the CLI loop always
    has — ``frame_flow`` pads every GT branch to the original size).

    The polar planes ``(ang_u8, magp_f16)`` move the per-frame flow
    colorization's float math (hypot, atan2, **0.5 at 0.9 Mpx — ~400 ms
    *per colorized image* in host float64, of which the loop draws six) to
    the device; the host keeps only the uint8 value-scaling, cv2's SIMD
    HSV→RGB, and the PNG encode (see
    ``visualizer.Visualizer.color_optical_flow_from_polar``).  f16 carries
    ``mag**0.5`` with ≤5e-4 relative error — ≲0.13 of a uint8 LSB after
    the 255 scaling.

    Folding the error pair in (vs the standalone
    :func:`_jit_flow_error_pair` dispatch) also drops the per-frame
    re-upload of the cropped pred/gt flows (~12 MB) the loop otherwise
    pays — the bundle already holds both on device."""
    from ..ops.image_warp import standardize_image_center
    from ..ops.poisson import poisson_integrate_flow

    def poisson_view(flow):
        p = poisson_integrate_flow(flow.astype(jnp.float32))
        return standardize_image_center(p).astype(jnp.uint8)

    def polar(flow):
        fx = flow[0].astype(jnp.float32)
        fy = flow[1].astype(jnp.float32)
        fx = jnp.where(jnp.isfinite(fx), fx, 0.0)
        fy = jnp.where(jnp.isfinite(fy), fy, 0.0)
        magp = jnp.sqrt(jnp.sqrt(fx * fx + fy * fy))   # ‖flow‖ ** 0.5
        ang = ((jnp.arctan2(fy, fx) + jnp.pi) * (180.0 / jnp.pi) / 2.0)
        return ang.astype(jnp.uint8), magp.astype(jnp.float16)

    def f(ev: Events, est: jax.Array, gt_flow: jax.Array,
          max_scale: jax.Array, est_scale: jax.Array, err_scale: jax.Array):
        # est_scale folds the GT-window time rescale (and the output
        # orientation sign) on device, so the solve's device-resident flow
        # feeds the renders directly — no 7.4 MB re-upload of the scaled
        # host copy over the remote-device link
        est32 = est.astype(jnp.float32)
        est_scaled = est32 * est_scale
        mask = create_eventmask(ev, image_shape)
        out = (_clipped_iwe(ev, image_shape, max_scale), mask,
               poisson_view(est_scaled), poisson_view(gt_flow),
               polar(est_scaled), polar(gt_flow))
        if err_crop is not None:
            # the evaluation pair compares the UNSCALED oriented flow
            # (err_scale = sign, or 1/time-scale on the host-flow path)
            x0, x1, y0, y1 = err_crop
            pred_c = (est32 * err_scale)[None, :, x0:x1, y0:y1]
            gt_c = gt_flow.astype(jnp.float32)[None, :, x0:x1, y0:y1]
            m = mask[:, x0:x1, y0:y1][None]
            out = out + (calculate_flow_error(gt_c, pred_c),
                         calculate_flow_error(gt_c, pred_c, event_mask=m))
        return out

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _jit_flow_error_pair(image_shape, crop):
    """Both per-frame error dicts (unmasked + event-masked) in ONE device
    program: the evaluation loop otherwise pays two dispatch+fetch round
    trips per frame over the remote-device link."""
    x0, x1, y0, y1 = crop

    def f(gt, pred, ev: Events):
        mask = create_eventmask(ev, image_shape)[:, x0:x1, y0:y1]
        return (calculate_flow_error(gt, pred),
                calculate_flow_error(gt, pred, event_mask=mask[None]))

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _jit_flow_error_pair_device(image_shape, crop):
    """Serving-mode twin of the :func:`_jit_render_bundle` error branch:
    the (unmasked, event-masked) pair computed from the solve's
    device-resident flow.  Dispatched right behind the solve (see
    :meth:`SolverBase.flow_errors_async`), so in the pipelined loop its
    round trip overlaps the solve instead of queueing behind the *next*
    frame's solve, and the ~7.4 MB pred/gt re-upload the host-flow path
    pays (``_jit_flow_error_pair``) shrinks to the cropped GT alone."""
    x0, x1, y0, y1 = crop

    def f(ev: Events, est, gt_c, err_scale):
        mask = create_eventmask(ev, image_shape)[:, x0:x1, y0:y1]
        pred_c = (est.astype(jnp.float32) * err_scale)[None, :, x0:x1, y0:y1]
        g = gt_c.astype(jnp.float32)[None]
        return (calculate_flow_error(g, pred_c),
                calculate_flow_error(g, pred_c, event_mask=mask[None]))

    return jax.jit(f)


def _evolution_stride(solver_config, n_iter: int) -> int:
    """Iterate-recording stride for DEBUG evolution videos.

    Like the reference's ``LossVideosMaker`` (active only when the logger is
    DEBUG-enabled, ``gml:50-58``), recording turns on at DEBUG level — or
    explicitly via the ``record_evolution`` config key (0 = off, n = every
    n-th iterate).  The default stride caps the video at ~120 frames.
    """
    if "record_evolution" in (solver_config or {}):
        return int(solver_config["record_evolution"])
    if logger.isEnabledFor(logging.DEBUG):
        return max(1, n_iter // 120)
    return 0


def _generative_spec(orig_image_shape, solver_config, dtype) -> GenerativeSpec:
    g = solver_config.get("generative_ml", {})
    cw = solver_config.get("cost_with_weight", {"diff_norm": 1.0})
    cd = solver_config.get("compute_dtype")
    compute_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                     None: None}.get(cd, None)
    return GenerativeSpec(
        warp_stencil_radius=int(solver_config.get("warp_stencil_radius", 1)),
        compute_dtype=compute_dtype,
        warp_compute_bf16=bool(solver_config.get("warp_compute_bf16", False)),
        image_size=tuple(orig_image_shape),
        no_polarity=bool(g.get("no_polarity", False)),
        iwe_sigma=float(g.get("iwe_sigma", 0) or 0),
        weight_by_event_hist=bool(g.get("weight_loss_by_event_hist", False)),
        weight_sigma=float(g.get("weight_sigma", 5)),
        weight_by_inverse_event_hist=bool(
            g.get("weight_loss_by_inverse_event_hist", False)),
        optimize_warp=bool(g.get("optimize_warp", False)),
        pxpy_as_anglemagn=bool(g.get("px-py_as-angle-magnitude", False)),
        angle_model=bool(g.get("angle_model", False)),
        poisson_model=bool(g.get("poisson_model", False)),
        use_log_intensity=bool(g.get("use_log_intensity", False)),
        sobel_ksize=int(g.get("sobel_ksize", 3)),
        cost_weights=tuple(cw.items()),
        dtype=dtype,
    )


class EstimationHandle:
    """Deferred result of :meth:`SolverBase.estimate_async`.

    The device work is already dispatched (JAX dispatch is asynchronous);
    :meth:`result` performs the host-side finalization — the blocking
    device→host fetch plus visualization/bookkeeping — exactly once.  The
    pipelined evaluation loop (``cli.evaluate_per_frames`` with
    ``pipeline: true``) uses this to overlap the device solve of frame *i*
    with the host-side preparation of frame *i+1*.
    """

    def __init__(self, finalize_fn):
        self._fn = finalize_fn
        self._result = None
        self._done = False

    def result(self) -> np.ndarray:
        if not self._done:
            self._result = self._fn()
            self._fn = None
            self._done = True
        return self._result


class SolverBase:
    """Public API parity with reference ``SolverBase`` (``base.py:54-378``)."""

    #: whether this facade's jitted program honors ``flow_fetch_dtype``
    #: (casts the fetched flow on device); facades that don't must reject
    #: the option instead of silently fetching float32
    SUPPORTS_FLOW_FETCH_DTYPE = False

    #: whether this facade's *solve* reads event timestamps.  Facades whose
    #: events enter the objective only through the polarity histogram
    #: (x, y, p) set this False, which lets :meth:`preprocess` honor a
    #: caller's ``need_t=False`` and upload the t-less quantized wire
    #: (5 B/event instead of 7-9) — see ``docs/performance.md`` §wire.
    EVENTS_NEED_T = True

    def __init__(self, orig_image_shape, crop_image_shape,
                 calibration_parameter=None, solver_config=None,
                 visualize_module=None):
        self.orig_image_shape = tuple(orig_image_shape)
        self.crop_image_shape = tuple(crop_image_shape)
        self.calib_param = calibration_parameter or {}
        self.slv_config = solver_config or {}
        self.visualizer = visualize_module
        self.padding = int(self.slv_config.get("outer_padding", 0))
        self.pad_image_shape = (crop_image_shape[0] + self.padding,
                                crop_image_shape[1] + self.padding)

        if "filter" in self.slv_config:
            fp = self.slv_config["filter"]["parameters"]
            self.preproc_filter = True
            self.filter_set = EventFilter(self.orig_image_shape,
                                          self.slv_config["filter"])
            self.crop_xmin, self.crop_xmax = fp["xmin"], fp["xmax"]
            self.crop_ymin, self.crop_ymax = fp["ymin"], fp["ymax"]
        else:
            self.preproc_filter = False
            self.crop_xmin, self.crop_ymin = 0, 0
            self.crop_xmax, self.crop_ymax = self.orig_image_shape

        self.dtype = (jnp.float64 if str(self.slv_config.get("precision", "32")) == "64"
                      else jnp.float32)
        self._e2vid_loader = self._setup_e2vid_loader()
        self.flow_convention = self.slv_config.get("flow_convention", "reference")
        self.normalize_t_in_batch = True
        self.previous_frame_best_estimation = None
        self.sequential_video_list: List[str] = []
        self.evaluation_text_list: List[str] = []
        self.iwe_visualize_max_scale = self.slv_config.get("max_scale", 50)
        self.motion_model = self.slv_config.get("motion_model", "dense-flow")
        self._rng = jax.random.PRNGKey(int(self.slv_config.get("seed", 0)))
        self.iter_cnt = 0       # frames finalized (visualization counter)
        self.dispatch_cnt = 0   # frames dispatched (pipelined mode runs ahead)
        # Serving-path wire options (docs/performance.md): quantized event
        # upload (``True``/"exact" = bit-exact for 1/32-px-aligned µs
        # streams with silent float32 fallback otherwise; "round" = snap
        # onto the wire grid, ≤1/64 px / ≤0.5 µs error, so continuous-time
        # or sub-pixel streams keep the compact upload) and
        # reduced-precision flow fetch.
        qu = self.slv_config.get("quantized_upload", False)
        self.wire_mode = ({True: "exact", "exact": "exact",
                           "round": "round"}.get(qu)
                          if qu else None)
        if qu and self.wire_mode is None:
            raise ValueError(f"quantized_upload: unknown mode {qu!r} "
                             "(expected true, 'exact' or 'round')")
        self.wire_quantized = self.wire_mode is not None
        self._wire_decode_jit: dict = {}
        self._wire_fell_back = False
        fetch = str(self.slv_config.get("flow_fetch_dtype", "float32"))
        if fetch not in ("float32", "float16", "bfloat16"):
            # fail loudly: a typo ("fp16", "half") would otherwise silently
            # fetch uncompressed float32 while the operator believes the
            # wire bytes were halved
            raise ValueError(f"flow_fetch_dtype: unknown dtype {fetch!r} "
                             "(expected float32, float16 or bfloat16)")
        self._fetch_dtype = {"float16": jnp.float16,
                             "bfloat16": jnp.bfloat16}.get(fetch)
        if (self._fetch_dtype is not None
                and not type(self).SUPPORTS_FLOW_FETCH_DTYPE):
            # same fail-loud contract as the dtype-name check: a valid value
            # on a solver that never consults it would silently fetch the
            # uncompressed float32 flow
            raise ValueError(
                "flow_fetch_dtype: not supported by "
                f"{type(self).__name__} — only the serving-path solver "
                "(patch_eklt_pyramid2) implements the reduced-precision "
                "flow fetch")
        logger.info("Solver configuration: %s", self.slv_config)

    # -- helpers ---------------------------------------------------------------
    def _next_key(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def prewarm(self, capacity: int) -> None:
        """Dispatch a throwaway solve so the backend's heavy-tailed
        first-execution stall overlaps the host-side preparation of the
        first real frame (JAX dispatch is asynchronous; the result is never
        fetched).  No-op here — solvers with a cached jitted program
        override.  Must never consume ``_next_key`` (outputs of the real
        frames must be bit-identical with and without prewarming)."""

    def _to_events(self, events, need_t: bool = True) -> Events:
        """Upload an event batch (or pass :class:`Events` through).

        ``need_t=False`` lets a caller that never reads timestamps (the
        pyramid solve — its events enter only through the polarity
        histogram) request the t-less quantized wire (5 B/event).  Callers
        that DO consume time (``preprocess`` period, ``calculate_fwl``
        warps) must keep the default.
        """
        if isinstance(events, Events):
            return events
        arr = np.asarray(events)
        cap = _bucket_capacity(len(arr))
        use_wire = self.wire_quantized
        if use_wire and self.dtype != jnp.float32 and self.wire_mode == "exact":
            # the exact wire contract is bitwise equality at float32; a
            # float64 direct upload carries precision the wire cannot, so
            # honor precision: "64" over the compact upload
            if not self._wire_fell_back:
                self._wire_fell_back = True
                logger.warning(
                    "quantized_upload (exact) is defined at float32; this "
                    "solver runs %s — using direct uploads ('round' mode "
                    "would keep the compact wire).", np.dtype(self.dtype))
            use_wire = False
        if use_wire:
            from ..types import decode_wire_events, encode_wire_events

            wire = encode_wire_events(arr, cap, include_t=need_t,
                                      mode=self.wire_mode)
            if wire is not None:
                key = (cap, "t_us" in wire)
                fn = self._wire_decode_jit.get(key)
                if fn is None:
                    fn = jax.jit(functools.partial(decode_wire_events,
                                                   dtype=self.dtype))
                    self._wire_decode_jit[key] = fn
                return fn(wire)
            if not self._wire_fell_back:
                self._wire_fell_back = True
                logger.warning(
                    "quantized_upload (%s): batch not representable on the "
                    "wire grid (%s) — falling back to float32 uploads.",
                    self.wire_mode,
                    "out-of-range values" if self.wire_mode == "round"
                    else "sub-1/32-px coordinates, off-µs-grid timestamps "
                         "or out-of-range values; 'round' mode would snap "
                         "them instead")
        return events_from_ndarray(arr, capacity=cap, dtype=self.dtype)

    # -- main API ----------------------------------------------------------------
    def preprocess(self, events, need_t: Optional[bool] = None):
        """Filter events; returns (events, time_period)
        (``base.py:123-139``).

        Raw ndarray input takes the host path: the native C++ filters run
        before the padded device upload; :class:`Events` input filters on
        device.

        ``need_t=False`` declares that the *caller* will not read the
        returned events' timestamps (no FWL metric, no event-warp
        visualizations).  Combined with a facade whose solve is t-free
        (``EVENTS_NEED_T = False``, e.g. the pyramid solver) this drops t
        from the quantized wire upload — 5 B/event instead of 7-9.  The
        time period is unaffected (computed from the host array before the
        upload); host-side filters also run before the upload, so
        time-dependent filters keep full timestamps either way.  Default
        ``None`` keeps t (safe for arbitrary downstream use).
        """
        carry_t = self.EVENTS_NEED_T or (need_t is None or bool(need_t))
        if isinstance(events, np.ndarray):
            # period from the raw host array: correct regardless of the
            # wire format the subsequent upload uses (a t-less quantized
            # upload decodes t as zeros)
            num_orig = len(events)
            period = (float(events[:, 2].max() - events[:, 2].min())
                      if num_orig else 0.0)
            if self.preproc_filter:
                filtered = self.filter_set.process_numpy(events)
                logger.info("After preprocessing %d out of %d.",
                            len(filtered), num_orig)
                return self._to_events(filtered, need_t=carry_t), period
            return self._to_events(events, need_t=carry_t), period

        ev = self._to_events(events)
        num_orig = int(ev.count())
        from ..ops.events import time_period

        period = float(time_period(ev))
        if self.preproc_filter:
            ev = self.filter_set.process(ev)
            logger.info("After preprocessing %d out of %d.", int(ev.count()),
                        num_orig)
        return ev, period

    def estimate(self, events, *args, **kwargs) -> np.ndarray:
        raise NotImplementedError

    def estimate_async(self, events, *args, **kwargs) -> EstimationHandle:
        """Dispatch the per-frame solve; defer the host-side finalization.

        Base implementation is synchronous (solvers whose estimate is not
        split into dispatch/finalize stages still work under the pipelined
        loop — they just don't overlap).  :class:`PatchEkltPyramid2`
        overrides this with a true async dispatch.
        """
        res = self.estimate(events, *args, **kwargs)
        return EstimationHandle(lambda: res)

    # -- evaluation -----------------------------------------------------------------
    def _eventmask(self, ev: Events) -> jax.Array:
        """Jitted ``[1, H, W]`` event mask, memoized per Events batch (the
        same filtered window is masked for pred/gt overlays and the masked
        error metric — one device program instead of three)."""
        memo = getattr(self, "_eventmask_memo", None)
        if memo is not None and memo[0] is ev.x:
            return memo[1]
        mask = _jit_eventmask(self.orig_image_shape)(ev)
        self._eventmask_memo = (ev.x, mask)
        return mask

    def calculate_flow_errors(self, pred_disp, gt_flow, events,
                              roi: dict) -> tuple:
        """(unmasked, event-masked) error dicts in one device round trip —
        the evaluation loop's per-frame pair (``bos_event.py:203-212``),
        semantically identical to two :meth:`calculate_flow_error` calls."""
        ev = self._to_events(events)
        crop = (roi["xmin"], roi["xmax"], roi["ymin"], roi["ymax"])
        nomask, masked = _jit_flow_error_pair(self.orig_image_shape, crop)(
            jnp.asarray(gt_flow)[None], jnp.asarray(pred_disp)[None], ev)
        out = tuple({k: float(v) for k, v in jax.device_get(d).items()}
                    for d in (nomask, masked))
        logger.info("flow_error = %s", out[0])
        logger.info("flow_error = %s", out[1])
        return out

    def flow_errors_async(self, events, gt_flow, est_device, crop):
        """Dispatch the per-frame (unmasked, event-masked) error pair right
        behind the solve, from the solve's device-resident UNORIENTED flow
        (``EstimationHandle.device_flow``); returns ``fetch() -> tuple``.

        The serving loop (``visualize: false``) otherwise computes the pair
        synchronously in finalize via :meth:`calculate_flow_errors`, which
        (a) re-uploads both cropped flows (~7.4 MB/frame over the remote
        tunnel) and (b) — in the pipelined loop, where the *next* frame's
        solve is already enqueued by finalize time — waits nearly a full
        solve for its program to reach the front of the device queue.
        Dispatched here the pair executes immediately after its own frame's
        solve and its scalars pre-copy asynchronously, exactly like the
        visualize-mode render bundle's error branch (which this mirrors:
        same crop, same on-device orientation sign, same symmetric
        ``flow_fetch_dtype`` cast of the GT upload).

        Semantics match :meth:`calculate_flow_errors` on the ROI-cropped
        oriented flow: bit-identical with float32 fetches; with
        ``flow_fetch_dtype: float16`` the GT upload (like the bundle's)
        and the pred rounding carry f16 precision (error-text deltas
        ~1e-3 px — docs/performance.md §end-to-end).
        """
        ev = self._to_events(events)
        sign = -1.0 if self.flow_convention == "physical" else 1.0
        x0, x1, y0, y1 = crop
        gt_c = np.asarray(gt_flow)[:, x0:x1, y0:y1]
        if getattr(self, "_fetch_dtype", None) is not None:
            gt_c = np.asarray(gt_c, self._fetch_dtype)
        out = _jit_flow_error_pair_device(
            self.orig_image_shape, tuple(crop))(
            ev, est_device, jnp.asarray(gt_c),
            jnp.asarray(sign, jnp.float32))
        for leaf in jax.tree_util.tree_leaves(out):
            try:
                leaf.copy_to_host_async()
            except AttributeError:  # pragma: no cover - non-array leaf
                pass

        def fetch() -> tuple:
            host = jax.device_get(out)
            errs = tuple({k: float(v) for k, v in d.items()} for d in host)
            logger.info("flow_error = %s", errs[0])
            logger.info("flow_error = %s", errs[1])
            return errs

        return fetch

    def calculate_flow_error(self, pred_disp, gt_flow, timescale: float = 1.0,
                             events=None, roi: Optional[dict] = None) -> dict:
        """Masked EPE/NPE/AE (``base.py:289-317``)."""
        if events is not None:
            ev = self._to_events(events)
            mask = self._eventmask(ev)
            mask = mask[:, roi["xmin"]:roi["xmax"], roi["ymin"]:roi["ymax"]]
            err = _jit_flow_error(True)(jnp.asarray(gt_flow)[None],
                                        jnp.asarray(pred_disp)[None],
                                        mask[None])
        else:
            err = _jit_flow_error(False)(jnp.asarray(gt_flow)[None],
                                         jnp.asarray(pred_disp)[None])
        out = {k: float(v) for k, v in jax.device_get(err).items()}
        logger.info("flow_error = %s for time period %s sec.", out, timescale)
        return out

    def calculate_fwl(self, flow, events) -> dict:
        """FWL = Var(IWE_orig)/Var(IWE) — < 1 is better.

        The reference's implementation references a cost class that does not
        exist (``base.py:319-340``); this one works.
        """
        ev = self._to_events(events)
        fwl = _jit_fwl(self.orig_image_shape, bool(self.normalize_t_in_batch))(
            ev, jnp.asarray(flow, self.dtype))
        return {"FWL": float(fwl)}

    def calculate_fwl_async(self, events, est_device, scale):
        """Pre-dispatched :meth:`calculate_fwl` from the solve's
        device-resident UNORIENTED flow (``EstimationHandle.device_flow``);
        returns ``fetch() -> dict``.

        Like :meth:`flow_errors_async`: dispatched right behind the solve
        the FWL program executes immediately after it (instead of queueing
        behind the *next* frame's solve in the pipelined loop) and skips
        the ~7.4 MB ``est_scaled`` re-upload — the GT-window time rescale
        and the orientation sign fold on device.  Values are bit-identical
        (±1 sign and f32 scale multiplications commute exactly).
        """
        ev = self._to_events(events)
        sign = -1.0 if self.flow_convention == "physical" else 1.0
        out = _jit_fwl_device(self.orig_image_shape,
                              bool(self.normalize_t_in_batch), self.dtype)(
            ev, est_device, jnp.asarray(float(scale) * sign, jnp.float32))
        try:
            out.copy_to_host_async()
        except AttributeError:  # pragma: no cover - non-array impl
            pass
        return lambda: {"FWL": float(jax.device_get(out))}

    def save_flow_error_as_text(self, nth_frame: int, flow_error_dict: dict,
                                fname: str = "flow_error_per_frame.txt"):
        """Append-only per-frame results (``base.py:342-353``)."""
        if self.visualizer is not None:
            path = os.path.join(self.visualizer.save_dir, fname)
        elif getattr(self, "output_dir", None):
            path = os.path.join(self.output_dir, fname)
        else:
            path = fname
        with open(path, "a") as f:
            f.write(f"frame {nth_frame}::" + str(flow_error_dict) + "\n")
        if path not in self.evaluation_text_list and fname != "timestamps_per_frame.txt":
            self.evaluation_text_list.append(path)

    def set_previous_frame_best_estimation(self, previous_best):
        self.previous_frame_best_estimation = previous_best

    def undistort_image(self, image: np.ndarray) -> np.ndarray:
        """Undistort a frame with the loader calibration (``base.py:363-378``)."""
        import cv2

        new_mtx, _ = cv2.getOptimalNewCameraMatrix(
            self.calib_param["K"], self.calib_param["D"],
            self.orig_image_shape, 1, self.orig_image_shape)
        return cv2.undistort(image, self.calib_param["K"],
                             self.calib_param["D"], None, new_mtx)

    # -- visualization ---------------------------------------------------------------
    def render_bundle(self, events, est_scaled, gt_flow,
                      est_device=None, est_scale=1.0,
                      err_crop=None) -> dict:
        """Per-frame visualization artifacts in one device program + fetch.

        Returns ``{"clipped", "mask", "poisson_est", "poisson_gt",
        "polar_est", "polar_gt"}`` (numpy) for the ``visualize_*`` methods'
        precomputed kwargs — the evaluation loop otherwise pays four
        dispatch+fetch round trips per frame plus six host-float64 flow
        colorizations (the polar planes carry those, see
        ``_jit_render_bundle``).

        ``est_device`` (+ ``est_scale``) optionally supplies the solve's
        device-resident UNORIENTED flow (``EstimationHandle.device_flow``):
        the GT-window rescale and the output-orientation sign then apply on
        device and the 7.4 MB host ``est_scaled`` upload is skipped.

        ``err_crop`` (the evaluation ROI ``(x0, x1, y0, y1)``) folds the
        per-frame (unmasked, event-masked) flow-error pair into the same
        program — semantically :meth:`calculate_flow_errors` on the
        ROI-cropped unscaled flows — returned under ``"errors"``.
        """
        return self.render_bundle_async(events, est_scaled, gt_flow,
                                        est_device=est_device,
                                        est_scale=est_scale,
                                        err_crop=err_crop)()

    def render_bundle_async(self, events, est_scaled, gt_flow,
                            est_device=None, est_scale=1.0, err_crop=None):
        """Dispatch the render-bundle program and start the device→host
        copies WITHOUT blocking; returns ``fetch() -> dict``.

        The evaluation loop calls this right after the solve dispatch (the
        bundle consumes the solve's device-resident output, so it queues
        behind it on device) — by finalize time the ~9 MB of render planes
        have already crossed the tunnel, overlapped with the previous
        frame's host PNG work, instead of being a blocking fetch inside
        the finalize stage.
        """
        ev = self._to_events(events)
        if est_device is not None:
            sign = -1.0 if self.flow_convention == "physical" else 1.0
            est_in = est_device
            sc = float(est_scale) * sign
            err_sc = sign
        else:
            est_in = jnp.asarray(est_scaled)
            sc = 1.0
            err_sc = 1.0 / float(est_scale) if est_scale else 1.0
        if getattr(self, "_fetch_dtype", None) is not None:
            # reduced-precision wire (flow_fetch_dtype) symmetrically: the
            # 7.4 MB full-frame GT upload halves too (≤5e-4 relative on
            # Farnebäck GT — error-text deltas ~1e-3 px, well inside the
            # ±0.02 px parity band; the program computes in f32 as before)
            gt_flow = np.asarray(gt_flow, self._fetch_dtype)
        out = _jit_render_bundle(self.orig_image_shape, err_crop)(
            ev, est_in, jnp.asarray(gt_flow),
            jnp.asarray(float(self.iwe_visualize_max_scale), jnp.float32),
            jnp.asarray(sc, jnp.float32),
            jnp.asarray(err_sc, jnp.float32))
        for leaf in jax.tree_util.tree_leaves(out):
            try:
                leaf.copy_to_host_async()
            except AttributeError:  # pragma: no cover - non-array leaf
                pass

        def fetch() -> dict:
            host = jax.device_get(out)
            clipped, mask, poi_est, poi_gt, pol_est, pol_gt = host[:6]
            if self.padding > 0:
                clipped = clipped[self.padding:-self.padding,
                                  self.padding:-self.padding]
            self._eventmask_memo = (ev.x, mask)  # consumers np.asarray() it
            bundle = {"clipped": clipped, "mask": mask,
                      "poisson_est": poi_est, "poisson_gt": poi_gt,
                      "polar_est": pol_est, "polar_gt": pol_gt}
            if err_crop is not None:
                errs = tuple({k: float(v) for k, v in d.items()}
                             for d in host[6:8])
                logger.info("flow_error = %s", errs[0])
                logger.info("flow_error = %s", errs[1])
                bundle["errors"] = errs
            return bundle

        return fetch

    def create_clipped_image(self, events, max_scale=50):
        """Inverted clipped IWE for viewing (``base.py:154-174``)."""
        ev = self._to_events(events)
        clipped = np.asarray(_jit_clipped_iwe(self.orig_image_shape)(
            ev, jnp.asarray(float(max_scale), jnp.float32)))
        if self.padding > 0:
            clipped = clipped[self.padding:-self.padding,
                              self.padding:-self.padding]
        return clipped

    def _register_video(self, prefix: str):
        if prefix not in self.sequential_video_list:
            self.sequential_video_list.append(prefix)

    def visualize_original_sequential(self, orig_events, filter_events,
                                      clipped=None):
        """(``base.py:208-229``).  ``clipped`` optionally supplies the
        precomputed IWE render (see :meth:`render_bundle`)."""
        if self.visualizer is None:
            return
        orig = orig_events.to_numpy() if isinstance(orig_events, Events) else orig_events
        self.visualizer.visualize_event(orig, file_prefix="original")
        self._register_video("original")
        if clipped is None:
            clipped = self.create_clipped_image(filter_events,
                                                self.iwe_visualize_max_scale)
        self.visualizer.visualize_image(clipped, file_prefix="original_filter")
        self._register_video("original_filter")

    def visualize_pred_sequential(self, events, flow, poisson=None,
                                  mask=None, polar=None):
        """(``base.py:231-252``).  ``poisson``/``mask``/``polar``
        optionally supply the precomputed views (see
        :meth:`render_bundle`)."""
        if self.visualizer is None:
            return
        flow = np.asarray(flow)
        self.visualizer.visualize_optical_flow(
            flow[0], flow[1], visualize_color_wheel=False,
            file_prefix="pred_flow", save_flow=True, polar=polar)
        self._register_video("pred_flow")
        self.visualizer.visualize_poisson_integration(
            flow, file_prefix="pred_flow_poisson", image=poisson)
        self._register_video("pred_flow_poisson")
        if mask is None:
            mask = np.asarray(self._eventmask(self._to_events(events)))
        self.visualizer.visualize_optical_flow_on_event_mask(
            flow, None, file_prefix="pred_masked", mask_color="black",
            mask_morph=True, mask=mask, polar=polar)
        self._register_video("pred_masked")

    def visualize_gt_sequential(self, events, gt_flow, poisson=None,
                                mask=None, polar=None):
        """(``base.py:254-273``)."""
        if self.visualizer is None:
            return
        gt_flow = np.asarray(gt_flow)
        self.visualizer.visualize_optical_flow(
            gt_flow[0], gt_flow[1], visualize_color_wheel=False,
            file_prefix="gt_flow", save_flow=False, polar=polar)
        self._register_video("gt_flow")
        self.visualizer.visualize_poisson_integration(
            gt_flow, file_prefix="gt_flow_poisson", image=poisson)
        self._register_video("gt_flow_poisson")
        if mask is None:
            mask = np.asarray(self._eventmask(self._to_events(events)))
        self.visualizer.visualize_optical_flow_on_event_mask(
            gt_flow, None, file_prefix="gt_masked", mask_color="black",
            mask_morph=True, mask=mask, polar=polar)
        self._register_video("gt_masked")

    def visualize_flows(self, pred_flow, gt_flow, polar_pred=None,
                        polar_gt=None):
        """(``base.py:276-287``)."""
        if self.visualizer is None:
            return
        self.visualizer.visualize_optical_flow_pred_and_gt(
            np.asarray(pred_flow), np.asarray(gt_flow),
            pred_file_prefix="flow_comparison_pred",
            gt_file_prefix="flow_comparison_gt",
            polar_pred=polar_pred, polar_gt=polar_gt)

    def visualize_one_batch_warp(self, events, warp=None):
        """(``base.py:177-190``)."""
        if self.visualizer is None:
            return
        ev = self._to_events(events)
        if warp is not None:
            motion = jnp.asarray(np.asarray(warp), self.dtype)
            ev = warp_event(ev, motion, self.motion_model, direction="middle",
                            normalize_t=self.normalize_t_in_batch)
        clipped = self.create_clipped_image(ev, self.iwe_visualize_max_scale)
        self.visualizer.visualize_image(clipped)

    def visualize_one_batch_warp_gt(self, events, gt_warp,
                                    motion_model: str = "dense-flow"):
        """(``base.py:192-206``)."""
        if self.visualizer is None:
            return
        ev = self._to_events(events)
        gt = np.asarray(gt_warp)
        if motion_model == "dense-flow" and gt.ndim == 3 and gt.shape[-1] == 2:
            gt = gt.transpose(2, 0, 1)
        warped = warp_event(ev, jnp.asarray(gt, self.dtype), motion_model,
                            direction="middle",
                            normalize_t=self.normalize_t_in_batch)
        clipped = self.create_clipped_image(warped, self.iwe_visualize_max_scale)
        self.visualizer.visualize_image(clipped)
        if motion_model == "dense-flow":
            self.visualizer.visualize_overlay_optical_flow_on_event(gt, clipped)

    # -- model image handling ---------------------------------------------------------
    def _setup_e2vid_loader(self):
        """Build the E2VID reconstruction loader for ``model_image: "e2vid"``.

        The reference whitelists "e2vid" (``generative_max_likelihood.py:22``)
        but never wires a frame source for it (its ``estimate`` only sets the
        frame for current/black/background, ``gml:695-698`` /
        ``patch_eklt_pyramid2.py:135-140`` — a latent crash).  Here the mode
        works: configure ``solver.generative_ml.e2vid`` with the E2VID loader
        keys (``root``/``dataset``/``sequence``) and the solver pulls the
        reconstruction nearest the current frame time.
        """
        gml_cfg = self.slv_config.get("generative_ml", {})
        if gml_cfg.get("model_image") != "e2vid" or "e2vid" not in gml_cfg:
            return None
        from ..data.e2vid import E2vidDataLoader

        e2_cfg = dict(gml_cfg["e2vid"])
        sequence = e2_cfg.pop("sequence", None)
        loader = E2vidDataLoader(config=e2_cfg)
        if sequence is not None:
            loader.set_sequence(sequence)
        return loader

    def _model_frame(self, kwargs) -> np.ndarray:
        mode = self.slv_config.get("generative_ml", {}).get("model_image", "current")
        if mode == "current":
            return np.asarray(kwargs["frame"])
        if mode == "black":
            return np.zeros_like(np.asarray(kwargs["frame"]))
        if mode == "background":
            if getattr(self, "_background", None) is None:
                self._background = np.asarray(kwargs["background"])
            return self._background
        if mode == "e2vid":
            # Explicit reconstruction wins; else look it up by frame time;
            # else the main loader already *is* E2VID and ``frame`` is the
            # reconstruction.
            if kwargs.get("e2vid_frame") is not None:
                return np.asarray(kwargs["e2vid_frame"])
            if self._e2vid_loader is not None:
                t = kwargs.get("frame_time")
                # dispatch_cnt, not iter_cnt: under the pipelined loop the
                # next frame is dispatched before the previous finalizes
                index = (max(self._e2vid_loader.time_to_image_index(t), 0)
                         if t is not None else self.dispatch_cnt)
                image, _ts = self._e2vid_loader.load_image(index)
                return np.asarray(image)
            if kwargs.get("frame") is not None:
                # only correct when the main data loader is E2VID (its
                # `frame` IS the reconstruction) — warn so a plain camera
                # loader misconfiguration is visible
                logger.warning(
                    "model_image 'e2vid' without a generative_ml.e2vid "
                    "loader config: using the supplied `frame` as the "
                    "reconstruction — valid only with the E2VID data "
                    "loader.")
                return np.asarray(kwargs["frame"])
            raise ValueError(
                "model_image 'e2vid' needs a generative_ml.e2vid loader "
                "config, an e2vid_frame kwarg, or an E2VID data loader "
                "supplying `frame`.")
        raise ValueError(f"Unknown model_image {mode!r}")

    def _viz_diff_scale(self):
        """``generative_ml.viz_diff_scale`` — the fixed color scale of the
        DEBUG ``opt_diff`` evolution view (``gml:388-396``)."""
        g = self.slv_config.get("generative_ml", {})
        return tuple(g.get("viz_diff_scale", (-0.25, 0.25)))

    def _orient_flow(self, flow: np.ndarray) -> np.ndarray:
        """Apply the output convention (see module docstring)."""
        if self.flow_convention == "physical":
            return -flow
        return flow


class GenerativeMaximumLikelihood(SolverBase):
    """Whole-ROI solver facade (reference
    ``GenerativeMaximumLikelihood.estimate``, ``gml:681-711``)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        opt = self.slv_config.get("optimizer", {})
        self.gen = _generative_spec(self.orig_image_shape, self.slv_config,
                                    self.dtype)
        bounds = tuple(
            (float(v["min"]), float(v["max"]))
            for v in opt.get("parameters", {}).values())
        self.spec = GmlSpec(
            gen=self.gen,
            roi=(self.crop_xmin, self.crop_xmax, self.crop_ymin, self.crop_ymax),
            method=opt.get("sampler", opt.get("method", "Adam"))
            if opt.get("method") == "optuna" else opt.get("method", "Adam"),
            n_iter=int(opt.get("n_iter", 600)),
            param_bounds=bounds,
            record_evolution=_evolution_stride(self.slv_config,
                                               int(opt.get("n_iter", 600))),
        )
        self._jitted = {}
        # True sequential TPE runs as a host-driven study (one small device
        # program per trial, like the reference's optuna loop) — it cannot
        # be one jitted program.  See solver/gml.py:make_host_tpe_solver.
        self._tpe_solver = (make_host_tpe_solver(self.spec)
                            if self.spec.method == "TPE" else None)

    def _solver_fn(self, capacity: int):
        if capacity not in self._jitted:
            self._jitted[capacity] = jax.jit(
                functools.partial(estimate_frame_gml, spec=self.spec))
        return self._jitted[capacity]

    def estimate_async(self, events, *args, **kwargs) -> EstimationHandle:
        ev = self._to_events(events)
        frame = jnp.asarray(self._model_frame(kwargs), self.dtype)
        if self._tpe_solver is not None:
            seed = int(jax.random.randint(self._next_key(), (), 0, 2**31 - 1))
            flow, aux = self._tpe_solver(ev, frame, seed)
        else:
            flow, aux = self._solver_fn(ev.capacity)(ev, frame,
                                                     self._next_key())

        def finalize() -> np.ndarray:
            if self.visualizer is not None:
                self.visualizer.visualize_scipy_history(
                    {"loss": np.asarray(aux["history"])})
                if "theta_history" in aux:
                    from .evolution import render_gml_evolution

                    render_gml_evolution(self.visualizer, frame, ev, aux,
                                         self.spec, self.iter_cnt,
                                         diff_scale=self._viz_diff_scale())
            self.iter_cnt += 1
            return self._orient_flow(np.asarray(flow))

        self.dispatch_cnt += 1
        return EstimationHandle(finalize)

    def estimate(self, events, *args, **kwargs) -> np.ndarray:
        return self.estimate_async(events, *args, **kwargs).result()


class PatchEklt(SolverBase):
    """Independent tiled solver facade (``patch_eklt.py:98-136``)."""

    spec_cls = PatchSpec
    _estimator = staticmethod(estimate_frame_patch)

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        opt = self.slv_config.get("optimizer", {})
        pe = self.slv_config.get("patch_eklt", {})
        self.gen = _generative_spec(self.orig_image_shape, self.slv_config,
                                    self.dtype)
        self.spec = PatchSpec(
            gen=self.gen,
            roi=(self.crop_xmin, self.crop_xmax, self.crop_ymin, self.crop_ymax),
            patch_size=int(pe.get("patch_size", 4)),
            sliding_window=int(pe.get("sliding_window",
                                      pe.get("patch_size", 4))),
            method=opt.get("method", "Adam"),
            n_iter=int(opt.get("n_iter", 600)),
            do_event_thresholding=bool(pe.get("do_event_thresholding", False)),
            event_thres=int(pe.get("event_thres", 8)),
        )
        self._jitted = {}

    def _solver_fn(self, capacity: int):
        if capacity not in self._jitted:
            self._jitted[capacity] = jax.jit(
                functools.partial(type(self)._estimator, spec=self.spec))
        return self._jitted[capacity]

    def estimate_async(self, events, *args, **kwargs) -> EstimationHandle:
        ev = self._to_events(events)
        frame = jnp.asarray(self._model_frame(kwargs), self.dtype)
        flow, _aux = self._solver_fn(ev.capacity)(ev, frame, self._next_key())

        def finalize() -> np.ndarray:
            self.iter_cnt += 1
            return self._orient_flow(np.asarray(flow))

        self.dispatch_cnt += 1
        return EstimationHandle(finalize)

    def estimate(self, events, *args, **kwargs) -> np.ndarray:
        return self.estimate_async(events, *args, **kwargs).result()


class PatchEkltDependent(PatchEklt):
    """Joint tiled solver facade (``patch_eklt_dependent.py:53-137``)."""

    _estimator = staticmethod(estimate_frame_dependent)


class PatchEkltPyramid2(SolverBase):
    """Coarse-to-fine pyramid facade — the flagship
    (``patch_eklt_pyramid2.py:134-191``)."""

    SUPPORTS_FLOW_FETCH_DTYPE = True  # cast applied in _solver_fn
    EVENTS_NEED_T = False  # solve consumes events only via (x, y, p)

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        opt = self.slv_config.get("optimizer", {})
        pe = self.slv_config.get("patch_eklt", {})
        self.gen = _generative_spec(self.orig_image_shape, self.slv_config,
                                    self.dtype)
        self.spec = PyramidSpec(
            gen=self.gen,
            roi=(self.crop_xmin, self.crop_xmax, self.crop_ymin, self.crop_ymax),
            coarsest_patch=int(pe.get("coarsest_patch_size", 64)),
            finest_patch=int(pe.get("finest_patch_size", 8)),
            n_iter=int(opt.get("n_iter", 600)),
            method=opt.get("method", "Adam"),
            lr=float(opt.get("lr", 0.05)),
            lr_decay=float(opt.get("lr_decay", 0.1)),
            track_best=bool(self.slv_config.get("track_best", True)),
            restrict_to_roi=bool(self.slv_config.get("restrict_to_roi", False)),
            roi_margin=int(self.slv_config.get("roi_margin", 2)),
            roi_norm_stride=int(self.slv_config.get("roi_norm_stride", 4)),
            record_evolution=_evolution_stride(self.slv_config,
                                               int(opt.get("n_iter", 600))),
            n_restarts=int(self.slv_config.get("n_restarts", 1)),
            restart_mode=str(self.slv_config.get("restart_mode", "map")),
        )
        if self.spec.restart_mode not in ("map", "vmap"):
            raise ValueError("restart_mode must be 'map' (sequential lanes, "
                             "~R× one solve) or 'vmap' (batched lanes), got "
                             f"{self.spec.restart_mode!r}")
        if self.spec.restrict_to_roi and self.spec.roi_margin < 2:
            # the exact-ROI cost algebra (solve_pyramid) requires every
            # nonzero |∇(flow·mask)| / TV / charbonnier summand to live
            # inside the margin-expanded box — the mask ridge plus one
            # difference stencil needs margin >= 2, below which the solve
            # silently optimizes a different objective
            raise ValueError(
                "restrict_to_roi requires roi_margin >= 2 (got "
                f"{self.spec.roi_margin}): the full-frame cost equivalence "
                "needs the ROI mask ridge and its difference stencil inside "
                "the cropped box.")
        if self.spec.n_restarts > 1 and self.slv_config.get("warm_start"):
            # warm starts pin every restart to the same init — R× the cost
            # for the single-start result (see estimate_frame)
            raise ValueError("n_restarts > 1 is a cold-start feature; it "
                             "does not compose with warm_start (all "
                             "restarts would share the warm init).")
        steady = self.slv_config.get("steady_n_iter")
        if steady is not None:
            # Warm starts carry convergence across frames, so warm-started
            # frames can run a shorter schedule than the cold floor
            # (measured: steady EPE unchanged at n_iter=300 vs the cold
            # floor of 450 — tools/warmstart_probe.py, docs/performance.md
            # §schedule scaling).  Frame 0 (and any frame after a reset)
            # keeps the full ``n_iter``.
            steady = int(steady)
            if not self.slv_config.get("warm_start"):
                raise ValueError(
                    "steady_n_iter requires warm_start: true — it shortens "
                    "only warm-started frames; without warm starts every "
                    "frame is cold and must run the full n_iter.")
            if steady < 1:
                raise ValueError(f"steady_n_iter must be >= 1, got {steady}")
            self.spec_steady = dataclasses.replace(
                self.spec, n_iter=steady,
                record_evolution=_evolution_stride(self.slv_config, steady))
        else:
            self.spec_steady = None
        self._mask = jnp.asarray(roi_mask(self.spec))
        self._jitted = {}
        self._last_aux = None

    def _solver_fn(self, capacity: int, steady: bool = False):
        # one jitted callable per (capacity bucket, schedule); jax.jit
        # itself re-traces (and caches) per input structure, so the
        # cold/warm-start variants (prev_params None vs array) share an
        # entry.  ``steady`` selects the shortened warm-frame schedule
        # when ``steady_n_iter`` is configured.
        spec = self.spec_steady if steady else self.spec
        if (capacity, steady) not in self._jitted:
            logger.info(
                "Building the solve program for event capacity %d — the "
                "first frame includes compilation (can take minutes on "
                "remote backends; subsequent frames are milliseconds).",
                capacity)
            base = functools.partial(estimate_frame, spec=spec)
            if self._fetch_dtype is not None:
                fetch_dtype = self._fetch_dtype

                def base(ev, frame, mask, key, prev_params=None,
                         _inner=functools.partial(estimate_frame, spec=spec)):
                    # cast the fetched flow inside the same program: halves
                    # the device→host bytes of the serving path
                    flow, aux = _inner(ev, frame, mask, key,
                                       prev_params=prev_params)
                    return flow.astype(fetch_dtype), aux
            self._jitted[(capacity, steady)] = jax.jit(base)
        return self._jitted[(capacity, steady)]

    def prewarm(self, capacity: int) -> None:
        """Trace/compile the cold-start solve program for ``capacity`` and
        dispatch it once on an all-invalid dummy batch.  The compile blocks
        the host briefly; the first *execution* — where this backend's
        heavy-tailed server-side stall lives (docs/performance.md §cold
        start) — runs asynchronously, overlapping the host-side prep of the
        first real frame.  Uses a fixed RNG key so the solver's key stream
        (and therefore every real frame's output) is unchanged."""
        fn = self._solver_fn(capacity)
        # dtype must match the real frames' uploads (self.dtype — e.g.
        # precision: "64") or the prewarmed program is never reused
        ev = events_from_ndarray(np.zeros((0, 4), np.float32),
                                 capacity=capacity, dtype=self.dtype)
        frame = jnp.zeros(self.orig_image_shape, self.dtype)
        self._prewarm_out = fn(ev, frame, self._mask, jax.random.PRNGKey(0),
                               prev_params=None)
        if self.slv_config.get("warm_start"):
            # Warm frames execute a DIFFERENT program with its own
            # first-execution stall: ``prev_params`` None → array is a new
            # jit trace, and ``steady_n_iter`` additionally swaps the spec.
            # Prewarm it too, fed from the dummy solve's own feedback (the
            # same pytree structure real warm frames pass), so the stall
            # doesn't resurface on frame 1 — exactly where the shortened
            # steady schedule is supposed to start paying off.
            from .pyramid import update_coarse_from_fine

            prev = update_coarse_from_fine(
                self._prewarm_out[1]["params_per_scale"], self.spec)
            fn_w = self._solver_fn(capacity,
                                   steady=self.spec_steady is not None)
            self._prewarm_out_warm = fn_w(ev, frame, self._mask,
                                          jax.random.PRNGKey(0),
                                          prev_params=prev)

    def estimate_async(self, events, *args, **kwargs) -> EstimationHandle:
        """Dispatch the pyramid solve; all device work (including the
        warm-start feedback for the *next* frame) is enqueued before this
        returns, so the caller can prepare frame *i+1* host-side while the
        chip works.  Host-only finalization (flow fetch, loss-history /
        evolution rendering, frame counter) runs in the returned handle."""
        # the pyramid solve consumes events only through the polarity
        # histogram (x, y, p) — never timestamps — so the quantized wire
        # omits t entirely (5 B/event instead of 17)
        ev = self._to_events(events, need_t=False)
        frame = jnp.asarray(self._model_frame(kwargs), self.dtype)
        prev = self.previous_frame_best_estimation
        steady = self.spec_steady is not None and prev is not None
        used_spec = self.spec_steady if steady else self.spec
        fn = self._solver_fn(ev.capacity, steady=steady)
        flow, aux = fn(ev, frame, self._mask, self._next_key(),
                       prev_params=prev)
        self._last_aux = aux
        try:
            # schedule the device→host copy now: it runs as soon as the
            # solve finishes, overlapping the finalize-side host work
            flow.copy_to_host_async()
        except AttributeError:
            pass
        if self.slv_config.get("warm_start"):
            # feed the coarse-from-fine feedback into the next frame's init
            # (the mechanism the reference defines but leaves disconnected,
            # ``patch_eklt_pyramid2.py:186-190``).  Pure device compute —
            # dispatched now so the next frame never waits on this host-side.
            from .pyramid import update_coarse_from_fine

            self.set_previous_frame_best_estimation(
                update_coarse_from_fine(aux["params_per_scale"], used_spec))

        def finalize() -> np.ndarray:
            if self.visualizer is not None:
                hist = {f"scale{i}": np.asarray(h)
                        for i, h in enumerate(aux["loss_history"])}
                self.visualizer.visualize_scipy_history(hist)
                if "params_history" in aux:
                    from .evolution import render_pyramid_evolution

                    render_pyramid_evolution(self.visualizer, frame, ev, aux,
                                             used_spec, self.iter_cnt,
                                             diff_scale=self._viz_diff_scale())
            self.iter_cnt += 1
            return self._orient_flow(np.asarray(flow, dtype=np.float32))

        self.dispatch_cnt += 1
        handle = EstimationHandle(finalize)
        # the UNORIENTED device-resident flow: render_bundle reuses it so
        # the visualization program needs no host flow re-upload
        handle.device_flow = flow
        return handle

    def estimate(self, events, *args, **kwargs) -> np.ndarray:
        return self.estimate_async(events, *args, **kwargs).result()


class ContrastMaximization(SolverBase):
    """CMax solver facade (events-only flow; the solver the reference's
    configs README documents but its code never shipped).

    Config: ``solver.cmax`` section with ``contrast_weights``, ``smoothness``,
    ``iwe_sigma``; ``motion_model`` / ``optimizer`` reuse the common keys.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        from .cmax import CmaxSpec, estimate_frame_cmax

        opt = self.slv_config.get("optimizer", {})
        cm = self.slv_config.get("cmax", {})
        pe = self.slv_config.get("patch_eklt", {})
        cw = cm.get("contrast_weights", {"image_variance": 1.0})
        bounds = tuple(
            (float(v["min"]), float(v["max"]))
            for v in opt.get("parameters", {}).values()) or ((-30, 30),) * 2
        self.spec = CmaxSpec(
            image_size=self.orig_image_shape,
            roi=(self.crop_xmin, self.crop_xmax, self.crop_ymin,
                 self.crop_ymax),
            motion_model=self.slv_config.get("motion_model", "dense-flow"),
            contrast_weights=tuple(cw.items()),
            smoothness=float(cm.get("smoothness", 0.01)),
            iwe_sigma=float(cm.get("iwe_sigma", 1.0)),
            direction=self.slv_config.get("warp_direction", "middle"),
            coarsest_patch=int(pe.get("coarsest_patch_size", 64)),
            finest_patch=int(pe.get("finest_patch_size", 16)),
            n_iter=int(opt.get("n_iter", 240)),
            method=opt.get("method", "Adam"),
            lr=float(opt.get("lr", 0.05)),
            param_bounds=bounds,
            dtype=self.dtype,
        )
        self._estimator = estimate_frame_cmax
        self._jitted = {}

    def estimate_async(self, events, *args, **kwargs) -> EstimationHandle:
        ev = self._to_events(events)
        if ev.capacity not in self._jitted:
            self._jitted[ev.capacity] = jax.jit(
                functools.partial(self._estimator, spec=self.spec))
        flow, aux = self._jitted[ev.capacity](ev, None, self._next_key())

        def finalize() -> np.ndarray:
            self.iter_cnt += 1
            # CMax flow is already the pattern displacement; the "reference"
            # orientation (negated generative fit) does not apply here.
            return np.asarray(flow)

        self.dispatch_cnt += 1
        return EstimationHandle(finalize)

    def estimate(self, events, *args, **kwargs) -> np.ndarray:
        return self.estimate_async(events, *args, **kwargs).result()


collections = {
    "generative_max_likelihood": GenerativeMaximumLikelihood,
    "patch_eklt": PatchEklt,
    "patch_eklt_dependent": PatchEkltDependent,
    "patch_eklt_pyramid2": PatchEkltPyramid2,
    "contrast_maximization": ContrastMaximization,
}
