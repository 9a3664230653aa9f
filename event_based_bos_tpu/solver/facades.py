"""Concrete solver facades + the reference-compatible registry.

Split out of :mod:`.api` (which keeps the shared ``SolverBase``) — round-5
refactor; no public API change (``solver.api`` re-exports everything here).
Registry parity: ``src/solver/__init__.py:10-16`` plus the
``contrast_maximization`` solver the reference's configs README documents
but its code never shipped.
"""

from __future__ import annotations

import dataclasses
import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..types import events_from_ndarray
from .api import EstimationHandle, SolverBase
from .generative import GenerativeSpec
from .gml import GmlSpec, estimate_frame_gml, make_host_tpe_solver
from .generative import iwe_cache
from .patch import PatchSpec, estimate_frame_dependent, estimate_frame_patch
from .pyramid import PyramidSpec, estimate_frame, roi_mask

logger = logging.getLogger(__name__)

__all__ = [
    "GenerativeMaximumLikelihood", "PatchEklt", "PatchEkltDependent",
    "PatchEkltPyramid2", "ContrastMaximization", "collections",
]


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
        # IWE-cache dispatch split (docs/performance.md §micro): the events
        # enter the pyramid solve ONLY through the once-per-frame polarity
        # histogram (SURVEY §3.2), so the cache can run as its own small
        # pre-dispatched program feeding the solve.  That is where the
        # Pallas hat-matmul vote kernel's isolated 3.4× win is real — the
        # same kernel EMBEDDED in the big solve program measured ~10 ms
        # slower (program-fusion effect, tools/iwe_split_probe.py).
        #   "auto" (default) → "pallas" on TPU, fused elsewhere;
        #   false → fused (cache inside the solve program, XLA scatter);
        #   "scatter"/"pallas" → split with that vote implementation.
        sic = self.slv_config.get("split_iwe_cache", "auto")
        if sic not in ("auto", False, "off", "scatter", "pallas"):
            raise ValueError(
                f"split_iwe_cache: unknown mode {sic!r} (expected 'auto', "
                "false, 'scatter' or 'pallas')")
        self._split_iwe = False if sic == "off" else sic
        self._cache_jit = {}
        self._mask = jnp.asarray(roi_mask(self.spec))
        # Cropped flow fetch: the solve's dense flow is exactly +0.0
        # outside the ROI box (``pyramid.py::solve_pyramid`` selects on the
        # {0,1} ``roi_mask``), so only the box needs to cross the
        # device→host wire — on the remote tunnel the full-frame f32 flow
        # (7.4 MB at the benchmark scale) is the single largest per-frame
        # fetch (docs/performance.md §end-to-end).  The host reconstruction
        # (``np.zeros`` + box paste) is bitwise identical to the full
        # fetch.  None when the ROI covers the frame.
        x0, x1, y0, y1 = self.spec.roi
        h_, w_ = self.spec.gen.image_size
        self._flow_fetch_box = ((x0, x1, y0, y1)
                                if (x1 - x0) * (y1 - y0) < h_ * w_ else None)
        # same exact-zero-outside guarantee feeds the render bundle's
        # cropped polar-plane fetch (api.render_bundle_async)
        self._est_zero_box = self._flow_fetch_box
        self._jitted = {}
        self._last_aux = None

    def _split_mode(self):
        """Resolve ``split_iwe_cache: auto`` at first device use: the Pallas
        vote kernel only lowers on TPU, and on CPU/interpret the split's
        extra dispatch has no payoff."""
        if self._split_iwe == "auto":
            self._split_iwe = ("pallas" if jax.default_backend() == "tpu"
                               else False)
        return self._split_iwe

    def _cache_fn(self, capacity: int):
        """Jitted standalone IWE-cache program (the split's first stage)."""
        if capacity not in self._cache_jit:
            gen_c = dataclasses.replace(
                self.gen, pallas_iwe=self._split_mode() == "pallas")
            self._cache_jit[capacity] = jax.jit(
                functools.partial(iwe_cache, spec=gen_c))
        return self._cache_jit[capacity]

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
            if self._fetch_dtype is not None or self._flow_fetch_box:
                fetch_dtype = self._fetch_dtype
                box = self._flow_fetch_box

                def base(ev, frame, mask, key, prev_params=None, cache=None,
                         _inner=functools.partial(estimate_frame, spec=spec)):
                    # shrink the fetched flow inside the same program: the
                    # optional reduced-precision cast halves the
                    # device→host bytes and the ROI crop drops the
                    # statically-zero outside region; ``aux["flow_device"]``
                    # keeps the full-frame (cast) flow device-resident for
                    # the render-bundle / error-pair programs
                    flow, aux = _inner(ev, frame, mask, key,
                                       prev_params=prev_params, cache=cache)
                    if fetch_dtype is not None:
                        flow = flow.astype(fetch_dtype)
                    aux = dict(aux, flow_device=flow)
                    if box is not None:
                        flow = jax.lax.slice(
                            flow, (0, box[0], box[2]), (2, box[1], box[3]))
                    return flow, aux
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
        # the split-cache variant is a DIFFERENT solve trace (cache tuple vs
        # None input) — prewarm the same program shape real frames will run
        cache = (self._cache_fn(capacity)(ev) if self._split_mode() else None)
        self._prewarm_out = fn(ev, frame, self._mask, jax.random.PRNGKey(0),
                               prev_params=None, cache=cache)
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
                                          prev_params=prev, cache=cache)

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
        # split mode: the IWE cache runs as its own pre-dispatched program
        # (the solve program consumes it and drops the dead event input)
        cache = (self._cache_fn(ev.capacity)(ev) if self._split_mode()
                 else None)
        flow, aux = fn(ev, frame, self._mask, self._next_key(),
                       prev_params=prev, cache=cache)
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

        box = self._flow_fetch_box

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
            arr = np.asarray(flow, dtype=np.float32)
            if box is not None:
                # reconstruct the full frame around the fetched ROI box —
                # bitwise identical to a full fetch: the solve writes exact
                # +0.0 outside the {0,1} mask (pyramid.py::solve_pyramid)
                full = np.zeros((2,) + tuple(self.orig_image_shape),
                                np.float32)
                full[:, box[0]:box[1], box[2]:box[3]] = arr
                arr = full
            return self._orient_flow(arr)

        self.dispatch_cnt += 1
        handle = EstimationHandle(finalize)
        # the UNORIENTED device-resident FULL-frame flow: render_bundle and
        # the error-pair program consume it on device (no host re-upload);
        # ``flow`` itself may be the ROI-cropped fetch tensor
        handle.device_flow = (aux["flow_device"] if isinstance(aux, dict)
                              and "flow_device" in aux else flow)
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
