"""Unit tests for the frame-based GT estimator (``frame_flow.py``).

Parity surface: reference ``frame_flow_estimator.py:30-95`` +
``frame_utils.py:117-183``.
"""

import numpy as np
import pytest

from event_based_bos_tpu.frame_flow import FrameFlowEstimator, bos_optical_flow


def _textured(h, w, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.random((h, w))
    # smooth so Farnebäck's polynomial expansion has structure to track
    import cv2

    img = cv2.GaussianBlur(img, (0, 0), 2.0)
    return (255 * (img - img.min()) / (np.ptp(img) + 1e-9)).astype(np.uint8)


PARAMS = {"pyr_scale": 0.5, "levels": 2, "winsize": 11, "iterations": 3,
          "poly_n": 5, "poly_sigma": 1.2, "flags": 0,
          "pad_x0": 3, "pad_x1": 5, "pad_y0": 2, "pad_y1": 4}


class TestFarneback:
    def test_known_translation_and_host_padding(self):
        """Flow of a shifted pattern ≈ the shift; the padded result places
        the cropped flow at (pad_x0, pad_y0) with zeros outside — the exact
        semantics of the reference's ``pad_to_same_resolution``
        (``frame_utils.py:117-139``), now a host-side ``np.pad``."""
        h, w = 96, 80
        a = _textured(h, w)
        shift = 2  # rows
        b = np.roll(a, shift, axis=0)
        est = FrameFlowEstimator(None)
        flow = est.opencv_farneback(a, b, PARAMS)
        assert flow.shape == (2, h + 8, w + 6)
        # zero padding outside the crop
        assert np.all(flow[:, :3, :] == 0)
        assert np.all(flow[:, -5:, :] == 0)
        assert np.all(flow[:, :, :2] == 0)
        assert np.all(flow[:, :, -4:] == 0)
        # interior: cv2 Farnebäck channel order is (col, row) = (flow_x,
        # flow_y); a +2-row shift shows up in channel 1
        interior = flow[:, 3 + 16:3 + h - 16, 2 + 16:2 + w - 16]
        assert abs(np.median(interior[1]) - shift) < 0.5
        assert abs(np.median(interior[0])) < 0.5

    def test_matches_raw_cv2_plus_numpy_pad(self):
        a = _textured(64, 48, seed=1)
        b = np.roll(a, 1, axis=1)
        raw = bos_optical_flow(a, b, PARAMS).transpose(2, 0, 1)
        padded = FrameFlowEstimator(None).opencv_farneback(a, b, PARAMS)
        np.testing.assert_array_equal(
            padded[:, 3:3 + 64, 2:2 + 48], raw)

    def test_physical_convention_swaps_axes(self):
        a = _textured(64, 48, seed=2)
        b = np.roll(a, 1, axis=0)
        ref = FrameFlowEstimator(None, convention="reference")
        phy = FrameFlowEstimator(None, convention="physical")
        f_ref = ref.opencv_farneback(a, b, PARAMS)
        f_phy = phy.opencv_farneback(a, b, PARAMS)
        np.testing.assert_array_equal(f_phy, f_ref[::-1])


class TestTwoStep:
    def test_two_step_runs_and_is_finite(self):
        """Background-anchored two-step flow (``frame_flow_estimator.py:45-67``):
        each one-step flow is padded to full resolution BEFORE the Poisson
        integrals (the reference's operation order — its two-step calls the
        padding one-step helper at :60-61), so the result is full-res."""
        h, w = 64, 48
        bg = _textured(h, w, seed=3)
        f1 = np.roll(bg, 1, axis=0)
        f2 = np.roll(bg, 2, axis=0)
        est = FrameFlowEstimator(None)
        flow = est.opencv_farneback_two_step(bg, f1, f2, PARAMS)
        assert flow.shape == (2, h + 8, w + 6)
        assert np.isfinite(flow).all()

    def test_dispatch(self):
        h, w = 64, 48
        bg = _textured(h, w, seed=4)
        f1 = np.roll(bg, 1, axis=0)
        f2 = np.roll(bg, 2, axis=0)
        est = FrameFlowEstimator(None)
        cfg = {"params_opencv_flow": PARAMS}
        out1 = est.estimate("opencv_flow", bg, f1, f2, cfg)
        out2 = est.estimate("opencv_flow_two_steps", bg, f1, f2, cfg)
        # every estimate() branch pads to the full frame (crop + pads)
        assert out1.shape == out2.shape == (2, h + 8, w + 6)
        with pytest.raises(NotImplementedError):
            est.estimate("nope", bg, f1, f2, cfg)
