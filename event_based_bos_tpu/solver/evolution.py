"""DEBUG observability: optimization-evolution videos.

Host-side renderer for the per-iteration prediction/measurement views the
reference produces at DEBUG log level (``LossVideosMaker``,
``generative_max_likelihood.py:39-82``; ``PatchEkltDependent
.visualize_evolution``, ``patch_eklt_dependent.py:139-176``).

The on-device solve already records the parameter trajectory
(``PyramidSpec.record_evolution`` / ``GmlSpec.record_evolution`` →
``aux["params_history"]`` / ``aux["theta_history"]``); this module replays
it through the generative model on host, writes ``opt_prediction`` /
``opt_measured`` frames and assembles an ``optimization`` video per solver
call — no per-iteration host round-trips during the optimization itself
(the reference pays a full host↔device sync every DEBUG iteration).
"""

from __future__ import annotations

import logging
import os

import jax.numpy as jnp
import numpy as np

from ..ops.gradients import frame_gradients
from ..ops.image_warp import range_norm
from .generative import (
    iwe_cache,
    measured_increment,
    params_to_fields,
    predict_increment,
    scalar_prediction,
)

__all__ = ["render_pyramid_evolution", "render_gml_evolution"]

logger = logging.getLogger(__name__)


def _make_child_visualizer(visualizer, iter_cnt: int):
    from ..visualizer import Visualizer

    save_dir = os.path.join(visualizer.save_dir, str(iter_cnt))
    return Visualizer(visualizer._image_size, show=False, save=True,
                      save_dir=save_dir)


def _emit(viz, pred: np.ndarray, measured: np.ndarray,
          diff_scale=(-0.25, 0.25)):
    diff = pred - measured
    lower, upper = diff_scale
    d_min, d_max = float(diff.min()), float(diff.max())
    # parity: the reference warns when the fixed color scale clips
    # (``gml:389-393``)
    if d_min < lower:
        logger.warning("The lowest value in diff is %s but lower scale is %s",
                       d_min, lower)
    if d_max > upper:
        logger.warning("The highest value in diff is %s but upper scale is %s",
                       d_max, upper)
    viz.visualize_image(
        np.asarray(range_norm(diff, lower=lower, upper=upper)).astype(np.uint8),
        file_prefix="opt_diff")
    viz.visualize_image(np.asarray(range_norm(pred)).astype(np.uint8),
                        file_prefix="opt_prediction")
    viz.visualize_image(np.asarray(range_norm(measured)).astype(np.uint8),
                        file_prefix="opt_measured")


def _finish(viz):
    for prefix in ("opt_diff", "opt_prediction", "opt_measured"):
        viz.visualize_sequential_images_as_video(prefix)


def render_pyramid_evolution(visualizer, frame, ev, aux, spec,
                             iter_cnt: int = 0,
                             diff_scale=(-0.25, 0.25)) -> None:
    """Render the pyramid solve's recorded trajectory to an evolution video.

    ``aux`` must carry ``params_history`` (set ``spec.record_evolution > 0``).
    One ``opt_prediction`` frame per recorded iterate across all scales, plus
    the constant ``opt_measured`` view, then mp4 assembly — parity with the
    reference's per-iteration ``LossVideosMaker`` output layout
    (``gml:692-694``: a per-call numbered subdirectory).
    """
    if "params_history" not in aux:
        return
    from .pyramid import pyramid_grids

    gen = spec.gen
    viz = _make_child_visualizer(visualizer, iter_cnt)
    fr = jnp.asarray(frame, gen.dtype)
    gx, gy = frame_gradients(fr, ksize=gen.sobel_ksize,
                             use_log_intensity=gen.use_log_intensity)
    hist, weights, _wi = iwe_cache(ev, gen)
    measured = np.asarray(measured_increment(hist, weights))
    grids = pyramid_grids(spec)
    for grid, params_hist in zip(grids, aux["params_history"]):
        for p in np.asarray(params_hist):
            fields = params_to_fields(jnp.asarray(p, gen.dtype), grid, gen)
            pred = predict_increment(fields["flow"], gx, gy, gen,
                                     fields.get("pxy"))
            _emit(viz, np.asarray(pred), measured, diff_scale)
    _finish(viz)


def render_gml_evolution(visualizer, frame, ev, aux, spec,
                         iter_cnt: int = 0,
                         diff_scale=(-0.25, 0.25)) -> None:
    """Render the whole-ROI solver's recorded scalar trajectory."""
    if "theta_history" not in aux:
        return
    gen = spec.gen
    viz = _make_child_visualizer(visualizer, iter_cnt)
    fr = jnp.asarray(frame, gen.dtype)
    gx, gy = frame_gradients(fr, ksize=gen.sobel_ksize,
                             use_log_intensity=gen.use_log_intensity)
    hist, weights, _wi = iwe_cache(ev, gen)
    measured = np.asarray(measured_increment(hist, weights, roi=spec.roi))
    x0, x1, y0, y1 = spec.roi
    weights_roi = None if weights is None else weights[x0:x1, y0:y1]
    for theta in np.asarray(aux["theta_history"]):
        th = jnp.asarray(theta, gen.dtype)
        # exactly the optimizer's prediction (shared code path)
        pred, _params = scalar_prediction(th, gx, gy, spec.roi, gen,
                                          weights_roi)
        _emit(viz, np.asarray(pred), measured, diff_scale)
    _finish(viz)
