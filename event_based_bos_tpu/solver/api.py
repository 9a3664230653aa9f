"""User-facing solver base class (reference-compatible facade).

The reference exposes solvers as classes constructed from the YAML config
(``src/solver/base.py:64-106``); this module provides the same constructor
signature and public methods (``preprocess`` / ``estimate`` /
``calculate_flow_error`` / ``calculate_fwl`` / ``save_flow_error_as_text`` /
``visualize_*``) on top of the functional jitted estimators.  Each facade
owns a cache of jitted per-frame solvers keyed by the padded event capacity
(power-of-two buckets → a handful of compiles per run).

Module layout (round-5 split; the public surface is unchanged):

  * :mod:`.programs` — the memoized jitted device-program builders
    (render bundle, error pairs, FWL, clipped IWE);
  * :mod:`.wire` — the host→device event-upload policy
    (``quantized_upload`` / ``flow_fetch_dtype``);
  * :mod:`.facades` — the concrete solver classes + the registry
    (re-exported here).

Flow-output convention: ``reference`` (default) returns exactly what the
upstream code returns; ``physical`` negates the generative-model flow so it
equals the pattern displacement in (row, col) — see ``docs/conventions.md``.
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.filters import EventFilter
from ..ops.warp import warp_event
from ..types import Events
from . import programs
from .wire import WireUploadMixin

logger = logging.getLogger(__name__)

# backward-compatible aliases (pre-split private names; tests and external
# callers may hold them)
_clipped_iwe = programs.clipped_iwe
_jit_clipped_iwe = programs.jit_clipped_iwe
_jit_eventmask = programs.jit_eventmask
_fwl = programs.fwl
_jit_fwl = programs.jit_fwl
_jit_fwl_device = programs.jit_fwl_device
_jit_flow_error = programs.jit_flow_error
_jit_render_bundle = programs.jit_render_bundle
_jit_flow_error_pair = programs.jit_flow_error_pair
_jit_flow_error_pair_device = programs.jit_flow_error_pair_device

# probe-grade A/B escape (tools/throughput_probe.py --viz-ab): False forces
# the legacy full-frame GT upload in render_bundle_async
_GT_CROP_ENABLED = True
# probe-grade A/B escape: False forces full-frame polar-plane fetches and
# the unpacked bool event mask (round-5 bundle shrink, bitwise-identical)
_BUNDLE_SHRINK_ENABLED = True


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


class SolverBase(WireUploadMixin):
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
        self._init_wire(self.slv_config)
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
        mask = programs.jit_eventmask(self.orig_image_shape)(ev)
        self._eventmask_memo = (ev.x, mask)
        return mask

    def calculate_flow_errors(self, pred_disp, gt_flow, events,
                              roi: dict) -> tuple:
        """(unmasked, event-masked) error dicts in one device round trip —
        the evaluation loop's per-frame pair (``bos_event.py:203-212``),
        semantically identical to two :meth:`calculate_flow_error` calls."""
        ev = self._to_events(events)
        crop = (roi["xmin"], roi["xmax"], roi["ymin"], roi["ymax"])
        nomask, masked = programs.jit_flow_error_pair(
            self.orig_image_shape, crop)(
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
        ~1e-3 px — docs/performance.md §end-to-end, bound enforced by
        ``tests/test_pipeline_e2e.py::test_serving_f16_error_text_bound``).
        """
        ev = self._to_events(events)
        sign = -1.0 if self.flow_convention == "physical" else 1.0
        x0, x1, y0, y1 = crop
        gt_c = np.asarray(gt_flow)[:, x0:x1, y0:y1]
        if getattr(self, "_fetch_dtype", None) is not None:
            gt_c = np.asarray(gt_c, self._fetch_dtype)
        out = programs.jit_flow_error_pair_device(
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
            err = programs.jit_flow_error(True)(jnp.asarray(gt_flow)[None],
                                                jnp.asarray(pred_disp)[None],
                                                mask[None])
        else:
            err = programs.jit_flow_error(False)(jnp.asarray(gt_flow)[None],
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
        fwl = programs.jit_fwl(self.orig_image_shape,
                               bool(self.normalize_t_in_batch))(
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
        out = programs.jit_fwl_device(self.orig_image_shape,
                                      bool(self.normalize_t_in_batch),
                                      self.dtype)(
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
        :func:`.programs.jit_render_bundle`).

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
        gt = np.asarray(gt_flow)
        gt_cropped = False
        if err_crop is not None:
            # the CLI's GT is zero outside the evaluation crop by
            # construction (frame_flow._pad_flow zero-pads the Farnebäck
            # crop), so upload only the box and zero-pad on device —
            # bit-identical renders at half the GT wire bytes.  Verified
            # per frame (a cheap host scan) so a non-CLI caller with real
            # data outside the box keeps the full upload.
            x0, x1, y0, y1 = err_crop
            full = (x0, x1, y0, y1) == (0, gt.shape[1], 0, gt.shape[2])
            if (_GT_CROP_ENABLED and not full
                    and not (gt[:, :x0].any() or gt[:, x1:].any()
                             or gt[:, x0:x1, :y0].any()
                             or gt[:, x0:x1, y1:].any())):
                gt = np.ascontiguousarray(gt[:, x0:x1, y0:y1])
                gt_cropped = True
        if getattr(self, "_fetch_dtype", None) is not None:
            # reduced-precision wire (flow_fetch_dtype) symmetrically: the
            # 7.4 MB full-frame GT upload halves too (≤5e-4 relative on
            # Farnebäck GT — error-text deltas ~1e-3 px, well inside the
            # ±0.02 px parity band; the program computes in f32 as before)
            gt = np.asarray(gt, self._fetch_dtype)
        # bundle-shrink fetches (bitwise-reconstructed on host): the est
        # polar planes crop to the solver's exact-zero ROI box — only safe
        # for the device-resident solve flow, whose outside is exactly
        # ±0.0 (pyramid.solve_pyramid) — and the bool mask ships bitpacked
        est_box = (getattr(self, "_est_zero_box", None)
                   if _BUNDLE_SHRINK_ENABLED and est_device is not None
                   else None)
        pack_mask = _BUNDLE_SHRINK_ENABLED
        out = programs.jit_render_bundle(self.orig_image_shape, err_crop,
                                         gt_cropped, est_box, pack_mask)(
            ev, est_in, jnp.asarray(gt),
            jnp.asarray(float(self.iwe_visualize_max_scale), jnp.float32),
            jnp.asarray(sc, jnp.float32),
            jnp.asarray(err_sc, jnp.float32))
        for leaf in jax.tree_util.tree_leaves(out):
            try:
                leaf.copy_to_host_async()
            except AttributeError:  # pragma: no cover - non-array leaf
                pass

        H, W = self.orig_image_shape

        def _fill_polar(planes, box):
            """Rebuild full-frame (ang_u8, magp_f16) from the box slice +
            the program-computed outside constant — bitwise identical (the
            constant ran the same elementwise arithmetic on the exact
            outside value)."""
            ang_c, mag_c, ang_k, mag_k = planes
            x0, x1, y0, y1 = box
            ang = np.full((H, W), ang_k.reshape(()), np.uint8)
            mag = np.full((H, W), mag_k.reshape(()), np.float16)
            ang[x0:x1, y0:y1] = ang_c
            mag[x0:x1, y0:y1] = mag_c
            return ang, mag

        def fetch() -> dict:
            host = jax.device_get(out)
            clipped, mask, poi_est, poi_gt, pol_est, pol_gt = host[:6]
            if pack_mask:
                mask = np.unpackbits(mask, axis=-1, count=W).astype(bool)
            if est_box is not None:
                pol_est = _fill_polar(pol_est, est_box)
            if gt_cropped:
                pol_gt = _fill_polar(pol_gt, err_crop)
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
        clipped = np.asarray(programs.jit_clipped_iwe(self.orig_image_shape)(
            ev, jnp.asarray(float(max_scale), jnp.float32)))
        if self.padding > 0:
            clipped = clipped[self.padding:-self.padding,
                              self.padding:-self.padding]
        return clipped

    def _register_video(self, prefix: str):
        if prefix not in self.sequential_video_list:
            self.sequential_video_list.append(prefix)
            if self.visualizer is not None:
                # frames of a registered prefix stream into the mp4 as they
                # are written (registration precedes the prefix's first
                # frame in every visualize_* method below), so the post-loop
                # "make video" step needs no PNG re-read
                self.visualizer.enable_video_stream(prefix)

    def visualize_original_sequential(self, orig_events, filter_events,
                                      clipped=None):
        """(``base.py:208-229``).  ``clipped`` optionally supplies the
        precomputed IWE render (see :meth:`render_bundle`)."""
        if self.visualizer is None:
            return
        orig = orig_events.to_numpy() if isinstance(orig_events, Events) else orig_events
        self._register_video("original")
        self.visualizer.visualize_event(orig, file_prefix="original")
        if clipped is None:
            clipped = self.create_clipped_image(filter_events,
                                                self.iwe_visualize_max_scale)
        self._register_video("original_filter")
        self.visualizer.visualize_image(clipped, file_prefix="original_filter")

    def visualize_pred_sequential(self, events, flow, poisson=None,
                                  mask=None, polar=None):
        """(``base.py:231-252``).  ``poisson``/``mask``/``polar``
        optionally supply the precomputed views (see
        :meth:`render_bundle`)."""
        if self.visualizer is None:
            return
        flow = np.asarray(flow)
        self._register_video("pred_flow")
        self.visualizer.visualize_optical_flow(
            flow[0], flow[1], visualize_color_wheel=False,
            file_prefix="pred_flow", save_flow=True, polar=polar)
        self._register_video("pred_flow_poisson")
        self.visualizer.visualize_poisson_integration(
            flow, file_prefix="pred_flow_poisson", image=poisson)
        if mask is None:
            mask = np.asarray(self._eventmask(self._to_events(events)))
        self._register_video("pred_masked")
        self.visualizer.visualize_optical_flow_on_event_mask(
            flow, None, file_prefix="pred_masked", mask_color="black",
            mask_morph=True, mask=mask, polar=polar)

    def visualize_gt_sequential(self, events, gt_flow, poisson=None,
                                mask=None, polar=None):
        """(``base.py:254-273``)."""
        if self.visualizer is None:
            return
        gt_flow = np.asarray(gt_flow)
        self._register_video("gt_flow")
        self.visualizer.visualize_optical_flow(
            gt_flow[0], gt_flow[1], visualize_color_wheel=False,
            file_prefix="gt_flow", save_flow=False, polar=polar)
        self._register_video("gt_flow_poisson")
        self.visualizer.visualize_poisson_integration(
            gt_flow, file_prefix="gt_flow_poisson", image=poisson)
        if mask is None:
            mask = np.asarray(self._eventmask(self._to_events(events)))
        self._register_video("gt_masked")
        self.visualizer.visualize_optical_flow_on_event_mask(
            gt_flow, None, file_prefix="gt_masked", mask_color="black",
            mask_morph=True, mask=mask, polar=polar)

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


# concrete facades + registry live in .facades (imported last: they subclass
# SolverBase above); re-exported here so `solver.api.collections` and the
# class names keep working unchanged
from .facades import (  # noqa: E402,F401
    ContrastMaximization,
    GenerativeMaximumLikelihood,
    PatchEklt,
    PatchEkltDependent,
    PatchEkltPyramid2,
    collections,
)
