"""Command-line entry point — parity with the reference's ``bos_event.py``.

Same flags (``--config_file``, ``--log``, ``--eval``), same YAML schema, same
four run modes:

  * ``--eval`` + ``estimation_method: solver`` → :func:`evaluate_per_frames`
    (``bos_event.py:109-220``): per-frame GT flow (Farnebäck) vs event-based
    solver estimate, error text files, visualizations.
  * ``--eval`` + ``estimation_method: openpiv`` →
    :func:`evaluate_flow_on_event_grids` (``bos_event.py:42-106``): PIV on
    event histograms (works here — the reference's path called an undefined
    function).
  * no ``--eval`` → :func:`estimate_sequential` (``bos_event.py:223-264``).
  * :func:`accumulate_sequential` (``bos_event.py:267-311``) via
    ``run_mode: accumulate``.

Run: ``python -m event_based_bos_tpu.cli --config_file configs/x.yaml --eval``
"""

from __future__ import annotations

import logging
import os
import sys

import numpy as np

logger = logging.getLogger(__name__)

SUPPORTED_EVALUATION_METHOD = ["opencv_flow", "opencv_flow_two_steps",
                               "openpiv", "openpiv_two_steps"]
SUPPORTED_ESTIMATION_METHOD = ["solver", "openpiv"]


def validate_image(image: np.ndarray, config: dict) -> np.ndarray:
    """ROI crop + even-size check (``bos_event.py:25-39``)."""
    image = image[..., config["xmin"]:config["xmax"],
                  config["ymin"]:config["ymax"]]
    assert image.shape[0] % 2 == 0, (
        f"Cropped height should be even: {config['xmin']}..{config['xmax']}")
    assert image.shape[1] % 2 == 0, (
        f"Cropped width should be even: {config['ymin']}..{config['ymax']}")
    return image


def _prefetched(items, fn, depth: int = 1):
    """Yield ``fn(item)`` in order, computing up to ``depth`` items ahead in
    a worker thread (host-side IO/GT prefetch for the pipelined loop)."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as ex:
        pending = deque()
        it = iter(items)
        for item in it:
            pending.append(ex.submit(fn, item))
            if len(pending) > depth:
                yield pending.popleft().result()
        while pending:
            yield pending.popleft().result()


def evaluate_per_frames(config, loader, solv, viz):
    """Frame-paced evaluation loop (``bos_event.py:109-220``).

    Extensions over the reference:

    * ``resume: true`` makes the loop restartable mid-sequence through the
      per-frame result manifest (:mod:`event_based_bos_tpu.utils.checkpoint`).
    * ``profile: true`` reports per-section host timings.
    * ``pipeline: true`` overlaps the stages across frames: host preparation
      (frame IO, Farnebäck GT, event windowing) for frame *i+1* runs in a
      prefetch thread while the device solves frame *i*, and the host-side
      finalization (visualizations, error texts) of frame *i* runs while
      frame *i+1*'s solve is in flight (JAX dispatch is asynchronous).
      Outputs are identical to the synchronous loop — same jitted solve,
      same RNG-key order, frame-ordered finalization.  (With ``profile``,
      the solve wait is attributed to ``finalize`` in pipelined mode —
      that is the point of the overlap; in synchronous mode it stays under
      ``estimate``.)

    Frame numbering is assigned in the *producer* (in frame order, after
    the collapsed-frame check), so resume entries always map to the same
    frames a fresh run would number — identically in both loop modes.

    * ``mesh: {data: D, event: E}`` (multi-chip) solves D frames per step
      data-parallel across a ``D×E`` device mesh: each step shards the
      polarity-vote scatter over the ``event`` axis (``psum`` reduction over
      ICI) and runs D independent pyramid solves over the ``data`` axis
      (``parallel.make_multichip_estimator``).  Requires the pyramid solver
      with ``model_image: current`` and no ``warm_start`` (frames in a step
      are solved simultaneously).  RNG-key order per frame matches the
      single-chip loop.

    * ``mesh: {data: D, event: E, sequential: true}`` + ``warm_start: true``
      scales the *sequential* warm-start algorithm instead: the frame range
      splits into D contiguous segments, each data lane runs its own
      warm-started chain (optionally at ``steady_n_iter``), and step *t*
      solves frame *t* of every segment in one program with the feedback
      params carried on device (``parallel.make_multichip_sequential``).
      Frame numbering is time-order positional.
    """
    import contextlib

    from . import frame_flow, utils
    from .utils.checkpoint import FrameResultStore
    from .utils.tracing import Timer

    store = (FrameResultStore(config["output_dir"])
             if config.get("resume") else None)
    timer = Timer() if config.get("profile") else None
    # Steady-state breakdown: a second timer engaged after the second
    # finalize (compilation and the heavy-tailed first execution land in
    # the first frames — docs/performance.md §cold start), reported per
    # frame against the steady wall clock, so the profile answers "where
    # does the steady ~1 s/frame go" instead of folding the cold start in.
    steady_timer = Timer() if timer is not None else None
    steady_state = [0, 0.0]  # finalized-frame count; steady window start
    pipeline = bool(config.get("pipeline"))

    mesh_cfg = config.get("mesh")
    batched_step = mesh_B = None
    seq_steps = None  # mesh sequential mode: (step_cold, step_warm)
    mesh_sequential = bool(mesh_cfg.get("sequential")) if mesh_cfg else False
    if mesh_cfg:
        import jax
        import jax.numpy as jnp

        from .parallel import make_mesh, make_multichip_estimator

        if config["solver"].get("method") != "patch_eklt_pyramid2":
            raise ValueError("mesh mode needs the patch_eklt_pyramid2 solver")
        if config["solver"].get("warm_start") and not mesh_sequential:
            raise ValueError("warm_start is sequential — incompatible with "
                             "mesh (simultaneous) frame batching; to scale "
                             "the warm-start chain across chips set "
                             "mesh: {sequential: true} (contiguous frame "
                             "segments, one warm chain per data lane)")
        if mesh_sequential:
            if not config["solver"].get("warm_start"):
                raise ValueError("mesh: {sequential: true} scales the "
                                 "warm-start chain — set solver "
                                 "warm_start: true")
            if config.get("resume"):
                # segment-aware restart: each lane drops its already-
                # computed leading frames and restarts COLD at its first
                # uncomputed frame (a chain reset — same semantics as that
                # lane's frame 0; the warm-start feedback of the killed
                # run is not persisted).  See run_segmented.
                logger.info("resume in sequential mesh mode: resumed lanes "
                            "restart their warm chain cold at their first "
                            "uncomputed frame.")
            if pipeline:
                # the segmented loop always runs its own one-step-deep
                # pipeline (produce step t+1 while step t solves on device)
                logger.info("pipeline: true is implicit in sequential mesh "
                            "mode — the segmented loop overlaps host prep "
                            "with the in-flight device step.")
        gml_cfg = config["solver"].get("generative_ml", {})
        if gml_cfg.get("model_image", "current") != "current":
            raise ValueError("mesh mode supports model_image: current")
        mesh_E = int(mesh_cfg.get("event", 1))
        if mesh_E < 1 or mesh_E & (mesh_E - 1):
            # event capacities are power-of-two buckets; a non-power-of-two
            # event axis would fail deep inside shard_map at the first step
            raise ValueError(f"mesh event axis must be a power of two to "
                             f"divide the padded event buckets, got {mesh_E}")
        mesh_B = int(mesh_cfg.get("data", 1))
        n_mesh = mesh_B * mesh_E
        if n_mesh > len(jax.devices()):
            raise ValueError(f"mesh {{data: {mesh_B}, event: {mesh_E}}} "
                             f"needs {n_mesh} devices; "
                             f"{len(jax.devices())} available")
        # a sub-mesh is fine: a D×E smaller than the host's device count
        # simply leaves the remaining chips idle
        mesh = make_mesh((mesh_B, mesh_E), devices=jax.devices()[:n_mesh])
        n_restarts = int(config["solver"].get("n_restarts", 1))
        if mesh_sequential:
            # D contiguous frame segments, one warm-start chain per data
            # lane, coarse-from-fine feedback carried inside the jitted
            # step (n_restarts+warm_start is already rejected by the
            # facade, so this branch never sees restarts)
            from .parallel import make_multichip_sequential

            seq_steps = make_multichip_sequential(
                solv.spec, mesh, steady_spec=solv.spec_steady,
                fetch_dtype=solv._fetch_dtype)
            logger.info(
                "Multi-chip sequential evaluation: mesh %s — %d warm-start "
                "segments in lockstep%s.",
                dict(zip(mesh.axis_names, mesh.devices.shape)), mesh_B,
                (" (steady_n_iter=%d)" % solv.spec_steady.n_iter)
                if solv.spec_steady is not None else "")
        elif n_restarts > 1:
            # restarts (not frames) shard over the data axis: one frame per
            # step, R/D restart lanes per chip, best-loss selection matching
            # the single-chip multi-start exactly
            from .parallel import make_multichip_multistart

            batched_step = make_multichip_multistart(
                solv.spec, mesh, fetch_dtype=solv._fetch_dtype)
            mesh_B = 1
            logger.info(
                "Multi-chip multi-start: mesh %s — %d restarts sharded over "
                "the data axis, one frame per step.",
                dict(zip(mesh.axis_names, mesh.devices.shape)), n_restarts)
        else:
            batched_step = make_multichip_estimator(
                solv.spec, mesh, fetch_dtype=solv._fetch_dtype)
            logger.info(
                "Multi-chip evaluation: mesh %s — %d frames per step.",
                dict(zip(mesh.axis_names, mesh.devices.shape)), mesh_B)

    eval_config = config["evaluation"]
    common = config["common_params"]
    cropped_shape = (config["data"]["crop_height"], config["data"]["crop_width"])
    # Timestamps survive preprocessing only when something downstream of the
    # solve reads them: event-warp visualizations (viz on) or the FWL
    # metric.  In serving mode without FWL a t-free facade (pyramid) then
    # uploads the 5 B/event t-less quantized wire.
    need_t_downstream = (viz is not None
                         or "fwl" in eval_config.get("metrics", []))
    eval_dt = eval_config["dt"]
    n_events = config["data"].get("n_events_per_batch")
    max_event_dt = config["data"].get("max_time_per_event_batch")
    convention = config.get("flow_convention", "reference")
    estimator = frame_flow.FrameFlowEstimator(viz, convention=convention)

    prewarm = config.get("prewarm")
    if prewarm:
        # Dispatch a throwaway solve NOW so the backend's heavy-tailed
        # first-execution stall (server-side, cache-independent —
        # docs/performance.md §cold start) overlaps the host-side frame IO /
        # GT / windowing below instead of serializing after it.  The event
        # capacity is a hint: ``prewarm: true`` derives it from
        # ``n_events_per_batch``; an integer value pins it explicitly.  A
        # wrong hint only wastes the one dummy compile.  Fixed RNG keys —
        # the real frames' key stream (and outputs) are unchanged.
        cap_hint = prewarm if not isinstance(prewarm, bool) else n_events
        if not cap_hint:
            logger.warning("prewarm: true needs n_events_per_batch (or an "
                           "integer prewarm capacity) — skipped.")
        else:
            from .types import bucket_capacity

            cap = bucket_capacity(int(cap_hint))
            if mesh_cfg:
                import numpy as _np

                from .parallel import stack_events
                from .types import events_from_ndarray

                # mesh steps take [B, N] events / [B, H, W] frames; the
                # sequential mode's step 0 is the cold program with
                # mesh_B lanes, the multistart step takes B = 1
                ev1 = events_from_ndarray(_np.zeros((0, 4), _np.float32),
                                          capacity=cap, dtype=solv.dtype)
                ev_b = stack_events([ev1] * mesh_B)
                frames = jnp.zeros((mesh_B,) + tuple(solv.orig_image_shape),
                                   solv.dtype)
                keys = jnp.stack([jax.random.PRNGKey(0)] * mesh_B)
                step0 = seq_steps[0] if mesh_sequential else batched_step
                _prewarm_out = step0(ev_b, frames, solv._mask, keys)
                if mesh_sequential:
                    # steps 1+ run the warm program (a different jit trace,
                    # with the steady spec when configured) — dispatch it
                    # once too, fed from the cold step's own feedback, so
                    # its first-execution stall also overlaps the prep
                    carry_valid = jnp.ones((mesh_B,), bool)
                    _prewarm_out = seq_steps[1](ev_b, frames, solv._mask,
                                                keys, _prewarm_out[1],
                                                carry_valid)
            else:
                solv.prewarm(cap)

    im0, _ = loader.load_image(0)
    _frame0 = validate_image(im0, common)
    remove_nose = utils.check_key_and_bool(config["data"], "remove_nose")
    roi = {k: common[k] for k in ("xmin", "xmax", "ymin", "ymax")}

    @contextlib.contextmanager
    def _section(name):
        if timer is None:
            yield
            return
        with timer.section(name):
            if steady_state[0] >= 2:
                with steady_timer.section(name):
                    yield
            else:
                yield

    # producer-side frame counter: incremented for every non-collapsed frame
    # in production order, so numbering matches a fresh run in both modes
    _next_frame = [0]

    def produce(i1, fi_override=None):
        """Host stage: frame IO, collapse check, frame numbering, resume
        lookup, then GT flow + event-window assembly
        (``bos_event.py:144-182``).  Returns (tag, i_frame, work).

        ``fi_override`` (sequential mesh mode) pins the frame number to the
        frame's *time-order* position instead of production order — the
        segmented loop produces frames in transposed (lane-major) order."""
        with _section("prepare"):
            i2 = i1 + eval_dt
            im1, t1 = loader.load_image(i1)
            im2, t2 = loader.load_image(i2)
            frame1 = validate_image(im1, common)
            frame2 = validate_image(im2, common)
            if frame1.shape != cropped_shape or frame2.shape != cropped_shape:
                logger.warning("Frame may be collapsed — i1=%s i2=%s", i1, i2)
                return ("collapsed", None, None)
            if fi_override is not None:
                fi = fi_override
            else:
                fi = _next_frame[0]
                _next_frame[0] = fi + 1
            if store is not None and fi in store:
                return ("resumed", fi, None)
            work = _prepare_work(im1, t1, t2, frame1, frame2)
        # preprocess here (producer side) so the event filtering and the
        # padded device upload of frame i+1 overlap the in-flight solve of
        # frame i in pipelined mode (device_put is thread-safe)
        with _section("preprocess"):
            work["filtered"], work["batch_time_scale"] = (
                solv.preprocess(work["batch"], need_t=need_t_downstream))
        return ("work", fi, work)

    def _prepare_work(im1, t1, t2, frame1, frame2):
        gt_flow = estimator.estimate(config["method"], _frame0, frame1,
                                     frame2, config)

        ind1 = loader.time_to_index(t1)
        ind2 = loader.time_to_index(t2)
        batch_for_gt = loader.load_event(max(ind1, 0), min(ind2, len(loader)))

        # window rebalancing (``bos_event.py:165-182``)
        if max_event_dt is not None and t2 - t1 > max_event_dt:
            t2 = t1 + max_event_dt
            ind1 = loader.time_to_index(t1)
            ind2 = loader.time_to_index(t2)
        if n_events is not None:
            if ind2 - ind1 < n_events:
                missing = n_events - (ind2 - ind1)
                ind1 -= missing // 2
                ind2 += missing // 2
            elif ind2 - ind1 > n_events:
                ind1 = ind2 - n_events
        batch = loader.load_event(max(ind1, 0), min(ind2, len(loader)))
        if remove_nose:
            from .ops.events import remove_event
            from .types import events_from_ndarray

            b = events_from_ndarray(batch)
            batch = remove_event(b, 0, 120, 990, 1050).to_numpy()
            bg = events_from_ndarray(batch_for_gt)
            batch_for_gt = remove_event(bg, 0, 120, 990, 1050).to_numpy()
        return dict(batch=batch, batch_for_gt=batch_for_gt, gt_flow=gt_flow,
                    im1=im1, t1=t1, t2=t2)

    def dispatch(work):
        """Device stage: enqueue the solve (non-blocking for pipelined
        solvers; preprocess already ran in the producer)."""
        with _section("estimate"):
            handle = solv.estimate_async(
                work["filtered"], work["gt_flow"], frame=work["im1"],
                background=im0, frame_time=work["t1"])
            dev_flow = getattr(handle, "device_flow", None)
            ts = work["batch_time_scale"]
            scale = (work["t2"] - work["t1"]) / ts if ts else 1.0
            if dev_flow is not None and "fwl" in eval_config.get(
                    "metrics", []):
                # FWL rides right behind the solve too (same finalize-side
                # latency/re-upload problem as the error pair)
                handle.fwl_fetch = solv.calculate_fwl_async(
                    work["filtered"], dev_flow, scale)
            if solv.visualizer is not None and dev_flow is not None:
                # dispatch the render bundle right behind the solve and
                # start its host copies — the ~9 MB of render planes then
                # cross the tunnel while the previous frame's PNGs encode,
                # instead of blocking finalize (render_bundle_async)
                handle.bundle_fetch = solv.render_bundle_async(
                    work["filtered"], None, work["gt_flow"],
                    est_device=dev_flow, est_scale=scale,
                    err_crop=(common["xmin"], common["xmax"],
                              common["ymin"], common["ymax"]))
            elif dev_flow is not None:
                # serving mode: the error pair rides right behind the solve
                # too — dispatched in finalize instead, it would re-upload
                # both flow crops AND queue behind the NEXT frame's already
                # enqueued solve in the pipelined loop (≈ a full extra solve
                # of latency per frame).  getattr: probes A/B the loop by
                # nulling the method (tools/throughput_probe.py --err-ab)
                pair_async = getattr(solv, "flow_errors_async", None)
                if pair_async is not None:
                    handle.errors_fetch = pair_async(
                        work["filtered"], work["gt_flow"], dev_flow,
                        (common["xmin"], common["xmax"],
                         common["ymin"], common["ymax"]))
        return handle

    def finalize(work, handle, i_frame):
        """Host stage: fetch the flow, render, evaluate, record
        (``bos_event.py:184-220``)."""
        with _section("finalize"):
            out = _finalize(work, handle, i_frame)
        if timer is not None:
            steady_state[0] += 1
            if steady_state[0] == 2:
                import time

                steady_state[1] = time.perf_counter()
        return out

    def _finalize(work, handle, i_frame):
        if viz is not None:
            # artifact names follow the frame number, not finalize call
            # order — they differ in sequential mesh mode (lane-major
            # steps) and under resume (skipped frames)
            viz.set_frame_index(i_frame)
        with _section("finalize/solve_wait"):
            estimation = handle.result()
        gt_flow, filtered = work["gt_flow"], work["filtered"]
        t1, t2 = work["t1"], work["t2"]
        gt_time_scale = t2 - t1
        batch_time_scale = work["batch_time_scale"]
        scale = gt_time_scale / batch_time_scale if batch_time_scale else 1.0
        est_scaled = estimation * scale

        errors = None
        with _section("finalize/visualize"):
            if solv.visualizer is not None:
                # all per-frame device renders in one program + fetch; the
                # evaluation error pair rides the same program (the flows
                # are already on device there).  The dispatch stage usually
                # pre-dispatched it with async host copies (bundle_fetch).
                fetch = getattr(handle, "bundle_fetch", None)
                if fetch is not None:
                    b = fetch()
                else:
                    b = solv.render_bundle(
                        filtered, est_scaled, gt_flow,
                        est_device=getattr(handle, "device_flow", None),
                        est_scale=scale,
                        err_crop=(common["xmin"], common["xmax"],
                                  common["ymin"], common["ymax"]))
                errors = b["errors"]
                solv.visualize_original_sequential(
                    work["batch_for_gt"], filtered, clipped=b["clipped"])
                solv.visualize_flows(est_scaled, gt_flow,
                                     polar_pred=b["polar_est"],
                                     polar_gt=b["polar_gt"])
                solv.visualize_pred_sequential(
                    filtered, est_scaled,
                    poisson=b["poisson_est"], mask=b["mask"],
                    polar=b["polar_est"])
                solv.visualize_gt_sequential(
                    filtered, gt_flow,
                    poisson=b["poisson_gt"], mask=b["mask"],
                    polar=b["polar_gt"])

        with _section("finalize/errors"):
            err_fetch = getattr(handle, "errors_fetch", None)
            if errors is not None:
                err_nomask, err_mask = errors
            elif err_fetch is not None:
                # pre-dispatched behind the solve (dispatch stage); the
                # scalars have already pre-copied by now
                err_nomask, err_mask = err_fetch()
            else:
                est_c = estimation[:, common["xmin"]:common["xmax"],
                                   common["ymin"]:common["ymax"]]
                gt_c = gt_flow[:, common["xmin"]:common["xmax"],
                               common["ymin"]:common["ymax"]]
                err_nomask, err_mask = solv.calculate_flow_errors(
                    est_c, gt_c, filtered, roi)
        solv.save_flow_error_as_text(i_frame, err_nomask,
                                     "flow_error_per_frame_without_mask.txt")
        solv.save_flow_error_as_text(i_frame, err_mask,
                                     "flow_error_per_frame_with_mask.txt")
        if "fwl" in eval_config.get("metrics", []):
            # Flow Warp Loss (Stoffregen 2020): the reference declares
            # this metric but its implementation is dead
            # (``base.py:319-340``); it works here.
            fwl_fetch = getattr(handle, "fwl_fetch", None)
            fwl = (fwl_fetch() if fwl_fetch is not None
                   else solv.calculate_fwl(est_scaled, filtered))
            solv.save_flow_error_as_text(i_frame, fwl, "fwl_per_frame.txt")
        solv.save_flow_error_as_text(i_frame, {"t1": t1, "t2": t2},
                                     "timestamps_per_frame.txt")
        if viz is None:
            # serving mode: the flow itself is the product — dump it with
            # the visualizer's naming scheme (scaled like the visualized
            # pred_flow .npy)
            np.save(os.path.join(config["output_dir"],
                                 f"pred_flow{i_frame}.npy"), est_scaled)
        if store is not None:
            if viz is not None:
                # the manifest marks this frame complete — its artifacts
                # must be on disk first, or a kill between record and the
                # async writer draining would resume past a frame with
                # missing PNGs
                viz.flush()
            store.record(i_frame, flow=estimation, t1=float(t1),
                         t2=float(t2), **err_nomask)

    def _lane_handle(flow_j, hist_j):
        """Single-lane finalize handle shared by both mesh loops
        (:func:`flush_batch` and :func:`run_segmented`): renders the
        per-scale loss curves and returns the float32, orientation-fixed
        flow — the same contract as the single-chip finalize."""
        from .solver.api import EstimationHandle

        def _fin():
            if solv.visualizer is not None:
                # same artifact as the single-chip loop: one curve per
                # pyramid scale
                solv.visualizer.visualize_scipy_history(
                    {f"scale{i}": np.asarray(h)
                     for i, h in enumerate(hist_j)})
            solv.iter_cnt += 1
            # float32 regardless of the (possibly reduced-precision) fetch
            # dtype — same contract as the single-chip finalize
            return solv._orient_flow(np.asarray(flow_j, dtype=np.float32))

        return EstimationHandle(_fin)

    def flush_batch(pending):
        """Solve ``pending`` = [(i_frame, work)] in ONE data-parallel step
        across the mesh, then finalize each frame in order."""
        import jax.numpy as jnp

        from .parallel import stack_events
        from .types import pad_events

        with _section("estimate"):
            works = [w for _, w in pending]
            cap = max(w["filtered"].capacity for w in works)
            evs = [pad_events(w["filtered"], cap) for w in works]
            keys = [solv._next_key() for _ in works]
            while len(evs) < mesh_B:  # pad a partial final batch
                evs.append(evs[-1])
                keys.append(keys[-1])
            ev_b = stack_events(evs)
            frames = jnp.stack(
                [jnp.asarray(w["im1"], solv.dtype) for w in works]
                + [jnp.asarray(works[-1]["im1"], solv.dtype)]
                * (mesh_B - len(works)))
            flows, losses = batched_step(ev_b, frames, solv._mask,
                                         jnp.stack(keys))

        for j, (fi, w) in enumerate(pending):
            # per-scale histories, like single-chip
            finalize(w, _lane_handle(flows[j], [h[j] for h in losses]), fi)

    def run_segmented(indices):
        """Sequential mesh mode: split ``indices`` into ``mesh_B`` contiguous
        segments and advance all segments in lockstep — step *t* solves
        frame *t* of every segment in ONE data-parallel program, with each
        lane's warm-start params carried on device between steps
        (``parallel.make_multichip_sequential``).

        Frame numbers are the frames' time-order positions (deterministic
        regardless of lane scheduling).  A collapsed frame keeps its lane's
        previous params (the dummy solve's feedback is gated out by
        ``carry_valid``); a collapse at a lane's FIRST step leaves the
        lane warm-starting from the dummy cold solve — an init heuristic
        either way, matching the spirit of ``warm_start``.  The warm chain
        resets at each ``time_list`` range, like the single-chip loop
        restarted per range would."""
        import jax.numpy as jnp

        from .parallel import stack_events
        from .types import pad_events

        step_cold, step_warm = seq_steps
        idx = list(indices)
        if not idx:
            return
        base = _next_frame[0]
        _next_frame[0] = base + len(idx)
        bounds = [round(d * len(idx) / mesh_B) for d in range(mesh_B + 1)]
        segments = [idx[bounds[d]:bounds[d + 1]] for d in range(mesh_B)]

        # resume: trim each lane's leading already-computed frames (the
        # per-frame manifest is written after every finalize, so a killed
        # run leaves each lane prefix-complete).  The trimmed lane restarts
        # at step 0 — which runs the COLD program — i.e. its warm chain
        # resets at the first uncomputed frame, exactly the lane-frame-0
        # semantics.  Frame numbers are unchanged (``skips`` offsets them),
        # so artifacts land under the same names as an uninterrupted run.
        skips = [0] * mesh_B
        if store is not None:
            for d in range(mesh_B):
                while (skips[d] < len(segments[d])
                       and (base + bounds[d] + skips[d]) in store):
                    skips[d] += 1
            if any(skips):
                logger.info(
                    "Resuming sequential mesh: lanes skip %s already-"
                    "computed frames; resumed lanes restart their warm "
                    "chain cold.", skips)
            segments = [s[k:] for s, k in zip(segments, skips)]
        n_steps = max(len(s) for s in segments)

        def _produce_step(t):
            lane_items = []  # (fi, work-or-None) per lane
            for d in range(mesh_B):
                if t < len(segments[d]):
                    fi = base + bounds[d] + skips[d] + t
                    tag, _, work = produce(segments[d][t], fi_override=fi)
                    lane_items.append((fi, work if tag == "work" else None))
                else:
                    lane_items.append((None, None))  # exhausted lane
            return lane_items

        # One-step-deep software pipeline, like the single-chip loop: the
        # solve of step t is DISPATCHED (async) before step t+1's host prep
        # (frame IO + Farnebäck GT + windowing) runs, and only then does
        # step t's finalize block on the flow fetch — so host prep overlaps
        # the in-flight device solve.  Outputs are bit-identical to the
        # strictly serial order (the key stream and finalize order are
        # unchanged).
        prev = None
        lane_items = _produce_step(0)
        for t in range(n_steps):
            dispatched = None
            dummy = next((w for _, w in lane_items if w is not None), None)
            if dummy is not None:  # else: whole step collapsed/exhausted
                with _section("estimate"):
                    cap = max(w["filtered"].capacity
                              for _, w in lane_items if w is not None)
                    evs, frames_l, keys = [], [], []
                    for _, w in lane_items:
                        src = w if w is not None else dummy
                        evs.append(pad_events(src["filtered"], cap))
                        frames_l.append(jnp.asarray(src["im1"], solv.dtype))
                        keys.append(solv._next_key())
                    ev_b = stack_events(evs)
                    frames = jnp.stack(frames_l)
                    valid = jnp.asarray(
                        [w is not None for _, w in lane_items])
                    if prev is None:
                        flows, prev, losses = step_cold(
                            ev_b, frames, solv._mask, jnp.stack(keys))
                    else:
                        flows, prev, losses = step_warm(
                            ev_b, frames, solv._mask, jnp.stack(keys), prev,
                            valid)
                dispatched = (lane_items, flows, losses)
            lane_items = _produce_step(t + 1) if t + 1 < n_steps else None
            if dispatched is not None:
                items, flows, losses = dispatched
                for j, (fi, w) in enumerate(items):
                    if w is None:
                        continue
                    finalize(w, _lane_handle(flows[j],
                                             [h[j] for h in losses]), fi)

    for t_start, t_end in eval_config["time_list"]:
        ind_start = loader.time_to_image_index(t_start) + 1
        ind_end = loader.time_to_image_index(t_end) - eval_dt
        logger.info("Evaluating frames %d..%d", ind_start, ind_end)
        indices = range(ind_start, ind_end)
        if mesh_sequential:
            run_segmented(indices)
            continue
        # one-deep software pipeline: produce(i+1) ‖ solve(i) ‖ finalize(i−1)
        stream = (_prefetched(indices, produce) if pipeline
                  else (produce(i1) for i1 in indices))
        in_flight = None  # (work, handle, i_frame)
        pending = []  # mesh mode: frames awaiting a full data-parallel step
        for tag, fi, work in stream:
            if tag == "collapsed":
                continue
            if tag == "resumed":
                logger.info("Frame %d already computed — skipping (resume).",
                            fi)
                continue
            if batched_step is not None:
                pending.append((fi, work))
                if len(pending) == mesh_B:
                    flush_batch(pending)
                    pending = []
                continue
            handle = dispatch(work)
            if pipeline:
                if in_flight is not None:
                    finalize(*in_flight)
                in_flight = (work, handle, fi)
            else:
                with _section("estimate"):
                    handle.result()  # keep the solve wait under 'estimate'
                finalize(work, handle, fi)
        if pending:
            flush_batch(pending)
        if in_flight is not None:
            finalize(*in_flight)
    if timer is not None:
        logger.info("Per-section host timings:\n%s", timer.report())
        n_steady = steady_state[0] - 2
        if n_steady > 0:
            import time

            wall = time.perf_counter() - steady_state[1]
            # In the pipelined loop frame 3's produce/dispatch may predate
            # the steady window and the last frame's finalize ends it, so
            # per-section attribution is approximate to ±1 frame of
            # prepare/estimate; shares are stable for n_steady ≳ 5.
            logger.info(
                "Steady-state sections (frames 3+, n=%d, wall %.3f "
                "s/frame) — shares of the steady wall:\n%s",
                n_steady, wall / n_steady,
                steady_timer.report(n_frames=n_steady, wall_s=wall))


def evaluate_flow_on_event_grids(config, loader, viz):
    """PIV over event-histogram image pairs (``bos_event.py:42-106``)."""
    from . import frame_flow
    from .ops.iwe import create_image_from_events
    from .types import events_from_ndarray

    piv_cfg = config["params_openpiv_events"]
    integration_time = piv_cfg["integration_time"]
    frame_distance = piv_cfg["frame_distance"]
    do_inversion = piv_cfg["do_inversion"]
    eval_config = config["evaluation"]
    eval_dt = eval_config["dt"]
    orig_shape = (config["data"]["height"], config["data"]["width"])
    estimator = frame_flow.FrameFlowEstimator(
        viz, convention=config.get("flow_convention", "reference"))

    for t_start, t_end in eval_config["time_list"]:
        ind_start = loader.time_to_image_index(t_start) + 1
        ind_end = loader.time_to_image_index(t_end) - eval_dt
        for i1 in range(ind_start, ind_end, eval_dt):
            _im1, t1 = loader.load_image(i1)

            def hist_at(ta, tb):
                e = loader.load_event(max(loader.time_to_index(ta), 0),
                                      min(loader.time_to_index(tb), len(loader)))
                ev = events_from_ndarray(e)
                h = np.asarray(create_image_from_events(ev, orig_shape, sigma=0))
                h = h * (255.0 / max(h.max(), 1e-9))
                return 255.0 - h if do_inversion else h

            hist1 = hist_at(t1 - integration_time, t1)
            hist2 = hist_at(t1 + frame_distance - integration_time,
                            t1 + frame_distance)
            flow, _fig = estimator.consecutive_openpiv(hist1, hist2, config)
            viz.visualize_optical_flow(flow[0], flow[1],
                                       file_prefix="event_flow_openpiv")
            viz.visualize_vector_field(flow, file_prefix="event_flow_vector")
            viz.visualize_image(hist1.astype(np.uint8), file_prefix="hist1")
            viz.visualize_image(hist2.astype(np.uint8), file_prefix="hist2")


def estimate_sequential(config, loader, solv, run_estimation: bool = False):
    """Sequential pass over fixed-stride time windows.

    Parity: ``bos_event.py:223-264`` — the reference ships this loop with the
    actual ``solv.estimate`` call commented out (it only renders filtered
    event videos).  ``run_estimation=True`` (config ``run_mode:
    sequential_estimate``) enables true streaming flow estimation with the
    previous frame warm-starting the next (``warm_start: true``).
    """
    eval_config = config["evaluation"]
    eval_dt = eval_config["dt"]
    sliding_window = 0.01
    i_frame = 0
    for t_start, t_end in eval_config["time_list"]:
        for t1 in np.arange(t_start, t_end, sliding_window):
            t2 = t1 + eval_dt * 0.008
            ind1 = loader.time_to_index(t1)
            ind2 = loader.time_to_index(t2)
            batch = loader.load_event(max(ind1, 0), min(ind2, len(loader)))
            filtered, _scale = solv.preprocess(batch)
            solv.save_flow_error_as_text(i_frame, {"t1": t1, "t2": t2},
                                         "timestamps_per_frame.txt")
            solv.visualize_original_sequential(batch, filtered)
            if run_estimation:
                frame = None
                if hasattr(loader, "time_to_image_index"):
                    try:
                        frame, _ts = loader.load_image(
                            max(loader.time_to_image_index(t1), 0))
                    except (NotImplementedError, AssertionError, IndexError):
                        frame = None
                estimation = solv.estimate(filtered, None, frame=frame,
                                           background=frame, frame_time=t1)
                solv.visualize_pred_sequential(filtered, estimation)
            i_frame += 1


def accumulate_sequential(config, loader, solv):
    """Accumulated polarity difference images (``bos_event.py:267-311``)."""
    from .ops.image_warp import standardize_image_center
    from .ops.iwe import create_polarity_iwe
    from .types import events_from_ndarray

    eval_config = config["evaluation"]
    eval_dt = eval_config["dt"]
    sliding_window = 0.01
    i_frame = 0
    for t_start, t_end in eval_config["time_list"]:
        pos_neg = np.zeros((2,) + solv.orig_image_shape)
        filt_pos_neg = np.zeros((2,) + solv.orig_image_shape)
        for t1 in np.arange(t_start, t_end, sliding_window):
            t2 = t1 + eval_dt * 0.008
            ind1 = loader.time_to_index(t1)
            ind2 = loader.time_to_index(t2)
            batch = loader.load_event(max(ind1, 0), min(ind2, len(loader)))
            filtered, _ = solv.preprocess(batch)
            ev = events_from_ndarray(batch)
            pos_neg += np.asarray(create_polarity_iwe(ev, solv.orig_image_shape))
            filt_pos_neg += np.asarray(
                create_polarity_iwe(filtered, solv.orig_image_shape))
            orig_img = np.asarray(
                standardize_image_center(pos_neg[0] - pos_neg[1]))
            solv.visualizer.visualize_image(orig_img.astype(np.uint8),
                                            file_prefix="orig")
            filt_img = np.asarray(
                standardize_image_center(filt_pos_neg[0] - filt_pos_neg[1]))
            solv.visualizer.visualize_image(filt_img.astype(np.uint8),
                                            file_prefix="filter")
            solv.save_flow_error_as_text(i_frame, {"t1": t1, "t2": t2},
                                         "timestamps_per_frame.txt")
            i_frame += 1


def main(argv=None):
    from . import data, solver, utils, visualizer

    config, args = utils.parse_args(argv=argv)
    data_config = config["data"]
    save_dir = config["output_dir"]
    utils.save_config(save_dir, args.config_file, args.log.upper())

    if config.get("debug_nans"):
        # NaN sanitizer (SURVEY §5 "race detection/sanitizers" analogue)
        import jax

        jax.config.update("jax_debug_nans", True)

    loader = data.collections[data_config["dataset"]](config=data_config)
    loader.set_sequence(data_config["sequence"])

    orig_shape = (data_config["height"], data_config["width"])
    crop_shape = (data_config["crop_height"], data_config["crop_width"])
    # ``visualize: false`` = serving mode — skip every per-frame image/video
    # artifact and produce only flow arrays + error texts (the host-side PNG
    # rendering dominates end-to-end throughput once the solve itself is
    # milliseconds; see docs/performance.md).  Only the solver evaluation
    # loop supports it; the other run modes exist to produce visuals.
    serving = not config.get("visualize", True)
    if serving and not (args.eval
                        and config.get("estimation_method") == "solver"):
        logger.warning("visualize: false only applies to the solver "
                       "evaluation loop — ignoring.")
        serving = False
    viz = (None if serving else
           visualizer.Visualizer(orig_shape, save=True, show=False,
                                 save_dir=save_dir,
                                 # PNG encode + history plot off the
                                 # dispatch path (flushed before video
                                 # assembly below)
                                 async_writes=True))

    method_name = config["solver"]["method"]
    config["solver"].setdefault("flow_convention",
                                config.get("flow_convention", "reference"))
    solv = solver.collections[method_name](
        orig_shape, crop_shape, calibration_parameter=loader.load_calib(),
        solver_config=config["solver"], visualize_module=viz)

    solv.output_dir = save_dir  # result-text destination when viz is off

    logger.info("Start BOS estimation.")
    if args.eval:
        assert config["method"] in SUPPORTED_EVALUATION_METHOD
        assert config["estimation_method"] in SUPPORTED_ESTIMATION_METHOD
        if config["estimation_method"] == "openpiv":
            evaluate_flow_on_event_grids(config, loader, viz)
        else:
            evaluate_per_frames(config, loader, solv, viz)
    elif config.get("run_mode") == "accumulate":
        accumulate_sequential(config, loader, solv)
    elif config.get("run_mode") == "sequential_estimate":
        estimate_sequential(config, loader, solv, run_estimation=True)
    else:
        estimate_sequential(config, loader, solv)

    if viz is not None:
        # drain the async artifact writer before anything reads the PNGs
        # back (video assembly) or the process exits
        viz.flush()
        for v in solv.sequential_video_list:
            logger.info("Make video %s…", v)
            viz.visualize_sequential_images_as_video(v)
        try:
            viz.concat_videos(["original", "pred_flow", "gt_flow"],
                              "flow_comparison")
            viz.concat_videos(["original", "pred_masked", "gt_masked"],
                              "flow_comparison_masked")
        except Exception as e:  # comparison videos are best-effort
            logger.warning("Video concat skipped: %s", e)
        try:
            viz.concat_videos(["original", "original_filter"],
                              "video_filter_effect")
        except Exception as e:
            logger.warning("Video concat skipped: %s", e)

    if args.eval:
        for fname in solv.evaluation_text_list:
            _data, stat = utils.read_flow_error_text(fname)
            logger.info("Evaluation %s:\n%s", fname, stat)
    return 0


if __name__ == "__main__":
    sys.exit(main())
