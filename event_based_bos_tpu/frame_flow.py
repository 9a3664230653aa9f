"""Frame-based GT flow estimation (Farnebäck / two-step / PIV).

Re-design of reference ``src/frame_flow_estimator.py``.  OpenCV Farnebäck
stays on the host (GT tooling, bit-compatible with the reference); the PIV
path routes to the in-repo TPU PIV implementation
(:mod:`event_based_bos_tpu.piv`) — the reference's ``openpiv`` branch called
an undefined function (``frame_flow_estimator.py:39``) and crashed; here it
works.

GT channel convention note: the reference transposes the cv2 flow to
``[2, H, W]`` where channel 0 is the **column** displacement and channel 1
the **row** displacement (``frame_flow_estimator.py:70-95``).  That is kept
as the ``"reference"`` convention; ``"physical"`` returns (row, col) to match
the solver/physics axis order.  See ``docs/conventions.md``.
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger(__name__)

SUPPORTED_METHODS = ("opencv_flow", "opencv_flow_two_steps", "openpiv")


def bos_optical_flow(frame_a: np.ndarray, frame_b: np.ndarray, config: dict
                     ) -> np.ndarray:
    """cv2 Farnebäck wrapper (``frame_utils.py:160-183``); returns [H, W, 2]."""
    import cv2

    return cv2.calcOpticalFlowFarneback(
        frame_a, frame_b, np.zeros(frame_a.shape + (2,), np.float32),
        config["pyr_scale"], config["levels"], config["winsize"],
        config["iterations"], config["poly_n"], config["poly_sigma"],
        config["flags"])


def _pad_flow(crop_flow: np.ndarray, pad_config: dict) -> np.ndarray:
    """Zero-pad a crop-shaped ``[2, h, w]`` flow to the full frame."""
    return np.pad(crop_flow,
                  [(0, 0),
                   (pad_config["pad_x0"], pad_config["pad_x1"]),
                   (pad_config["pad_y0"], pad_config["pad_y1"])])


class FrameFlowEstimator:
    """Dispatch over GT estimation methods (``frame_flow_estimator.py:30-42``)."""

    def __init__(self, visualizer_module=None, convention: str = "reference"):
        self.visualizer = visualizer_module
        assert convention in ("reference", "physical")
        self.convention = convention

    def _orient(self, flow_2hw: np.ndarray) -> np.ndarray:
        if self.convention == "physical":
            return flow_2hw[::-1].copy()  # (col,row) → (row,col)
        return flow_2hw

    def estimate(self, method: str, frame0, frame1, frame2, config: dict):
        """Full-resolution GT flow ``[2, H, W]`` for the evaluation loop.

        Every branch returns the flow padded to the original frame size.
        The reference's one-step and two-step branches already do (the
        two-step path pads internally via the one-step helper,
        ``frame_flow_estimator.py:60-61,94``); its ``openpiv`` branch calls
        an undefined function and crashes (``frame_flow_estimator.py:39``) —
        the working PIV here pads its crop-shaped result to match.
        """
        if method == "opencv_flow":
            return self.opencv_farneback(frame1, frame2,
                                         config["params_opencv_flow"])
        if method == "opencv_flow_two_steps":
            # Already full-resolution: the two-step helper pads each
            # one-step flow before Poisson integration, matching the
            # reference's operation order (frame_flow_estimator.py:60-67
            # pads via the one-step helper at :94).
            return self.opencv_farneback_two_step(
                frame0, frame1, frame2, config["params_opencv_flow"])
        if method == "openpiv":
            # consecutive_openpiv returns (flow, figure) for the
            # event-grid-PIV path; the GT contract here is a bare array
            flow, _fig = self.consecutive_openpiv(frame1, frame2, config)
            return _pad_flow(np.asarray(flow), config["params_opencv_flow"])
        raise NotImplementedError(f"{method} is not supported")

    def opencv_farneback(self, frame1, frame2, params_opencv_flow,
                         visualize_frame: bool = False) -> np.ndarray:
        """One-step Farnebäck between consecutive frames, padded to full res
        (``frame_flow_estimator.py:70-95``)."""
        f = bos_optical_flow(frame1, frame2, params_opencv_flow)
        if visualize_frame and self.visualizer is not None:
            self.visualizer.visualize_optical_flow(f[..., 0], f[..., 1],
                                                   file_prefix="frame_flow_concurrent")
        crop_flow = f.transpose(2, 0, 1)
        # GT tooling stays on host (SURVEY §7): a device round-trip for a
        # trivial zero-pad costs an upload + a 7 MB fetch per frame over the
        # remote-TPU tunnel.
        return self._orient(_pad_flow(crop_flow, params_opencv_flow))

    def opencv_farneback_two_step(self, frame0, frame1, frame2,
                                  params_opencv_flow) -> np.ndarray:
        """Background-anchored two-step flow via Poisson integrals
        (``frame_flow_estimator.py:45-67``).

        Operation order matches the reference exactly: each one-step flow is
        zero-padded to the full frame *before* Poisson integration (the
        reference's two-step calls its one-step helper, which pads at
        ``frame_flow_estimator.py:94``), because the DST Poisson solution
        depends globally on the integration domain — integrating over the
        crop would change values even inside the crop.  The final Farnebäck
        therefore runs at full resolution and the result needs no padding.
        """
        from .visualizer import _poisson_view

        def one_step_padded(a, b):
            f = bos_optical_flow(a, b, params_opencv_flow).transpose(2, 0, 1)
            return _pad_flow(f, params_opencv_flow)

        f01 = one_step_padded(frame0, frame1)
        f02 = one_step_padded(frame0, frame2)

        def integral(f):
            # one jitted device program (poisson DST + standardize → uint8)
            return np.asarray(_poisson_view(f[1], f[0]))

        p01 = integral(f01)
        p02 = integral(f02)
        f12 = bos_optical_flow(p01, p02, params_opencv_flow).transpose(2, 0, 1)
        return self._orient(f12)

    def consecutive_openpiv(self, frame1, frame2, config: dict,
                            visualize_frame: bool = False):
        """Multipass window-deformation PIV between two frames.

        The reference names this method but never defines it
        (``frame_flow_estimator.py:39`` → crash); implemented here via the
        in-repo TPU PIV pipeline.
        """
        from .piv import piv_multipass
        from .utils.config import load_config_openpiv

        settings = load_config_openpiv(config["params_openpiv"],
                                       config["common_params"], ".")
        flow = piv_multipass(np.asarray(frame1, np.float32),
                             np.asarray(frame2, np.float32), settings)
        return self._orient(flow), None
