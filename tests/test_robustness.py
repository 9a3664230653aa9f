"""Degenerate-input robustness of the solver facades and kernels.

The reference's failure handling is try/except-log-and-continue
(SURVEY §5); here the same situations must produce finite, well-defined
results without exceptions — these tests pin that contract for the inputs a
production deployment actually sees: empty windows, all-noise windows,
out-of-frame coordinates, constant frames, single events, capacity edges.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from event_based_bos_tpu import events_from_ndarray
from event_based_bos_tpu.solver import GenerativeSpec, PyramidSpec
from event_based_bos_tpu.solver.pyramid import estimate_frame, roi_mask
from event_based_bos_tpu.solver import collections as solver_collections

H, W = 48, 64


def _spec(**kw):
    gen = GenerativeSpec(image_size=(H, W), iwe_sigma=2.0,
                         weight_by_inverse_event_hist=True,
                         optimize_warp=True, poisson_model=True)
    base = dict(gen=gen, roi=(0, H, 0, W), coarsest_patch=16, finest_patch=8,
                n_iter=8)
    base.update(kw)
    return PyramidSpec(**base)


def _solve(ev, frame, spec=None):
    spec = spec or _spec()
    mask = jnp.asarray(roi_mask(spec))
    flow, _aux = estimate_frame(ev, jnp.asarray(frame, jnp.float32), mask,
                                jax.random.PRNGKey(0), spec)
    return np.asarray(flow)


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(0)
    import cv2

    f = cv2.GaussianBlur(rng.random((H, W)), (0, 0), 1.5)
    return (255 * f / f.max()).astype(np.float32)


class TestDegenerateEventWindows:
    def test_empty_window_solves_finite(self, frame):
        ev = events_from_ndarray(np.zeros((0, 4)), capacity=4096)
        flow = _solve(ev, frame)
        assert flow.shape == (2, H, W) and np.isfinite(flow).all()

    def test_single_event(self, frame):
        ev = events_from_ndarray(
            np.array([[10.0, 20.0, 0.5, 1.0]]), capacity=4096)
        flow = _solve(ev, frame)
        assert np.isfinite(flow).all()

    def test_all_events_out_of_frame(self, frame):
        rng = np.random.default_rng(1)
        arr = np.stack([rng.uniform(H + 5, H + 50, 500),
                        rng.uniform(W + 5, W + 50, 500),
                        np.sort(rng.uniform(0, 1, 500)),
                        rng.integers(0, 2, 500).astype(float)], 1)
        ev = events_from_ndarray(arr, capacity=4096)
        flow = _solve(ev, frame)
        assert np.isfinite(flow).all()

    def test_uniform_noise_events(self, frame):
        rng = np.random.default_rng(2)
        arr = np.stack([rng.uniform(0, H, 5000), rng.uniform(0, W, 5000),
                        np.sort(rng.uniform(0, 1, 5000)),
                        rng.integers(0, 2, 5000).astype(float)], 1)
        ev = events_from_ndarray(arr, capacity=8192)
        flow = _solve(ev, frame)
        assert np.isfinite(flow).all()

    def test_identical_timestamps(self, frame):
        rng = np.random.default_rng(3)
        arr = np.stack([rng.uniform(0, H, 1000), rng.uniform(0, W, 1000),
                        np.full(1000, 0.25),
                        rng.integers(0, 2, 1000).astype(float)], 1)
        ev = events_from_ndarray(arr, capacity=1024)
        flow = _solve(ev, frame)
        assert np.isfinite(flow).all()


class TestDegenerateFrames:
    def _events(self, n=2000, seed=0):
        rng = np.random.default_rng(seed)
        return events_from_ndarray(
            np.stack([rng.uniform(0, H, n), rng.uniform(0, W, n),
                      np.sort(rng.uniform(0, 1, n)),
                      rng.integers(0, 2, n).astype(float)], 1),
            capacity=2048)

    def test_constant_frame_zero_gradients(self):
        """A textureless frame gives a zero generative prediction — the
        normalization epsilon must keep everything finite (the reference
        crashes into its except-and-continue here, ``gml:334-338``)."""
        flow = _solve(self._events(), np.full((H, W), 127.0))
        assert np.isfinite(flow).all()

    def test_frame_with_nan_pixels_does_not_crash(self):
        f = np.full((H, W), 100.0)
        f[5, 5] = np.nan
        flow = _solve(self._events(), f)
        assert flow.shape == (2, H, W)  # NaN may propagate; no exception

    def test_uint8_and_float64_frames_accepted(self):
        for dtype in (np.uint8, np.float64):
            flow = _solve(self._events(), np.full((H, W), 90).astype(dtype))
            assert np.isfinite(flow).all()


class TestFacadeEdges:
    def _facade(self, **solver_extra):
        cfg = {
            "method": "patch_eklt_pyramid2",
            "filter": {"filters": None,
                       "parameters": {"xmin": 0, "xmax": H,
                                      "ymin": 0, "ymax": W}},
            "outer_padding": 0,
            "cost_with_weight": {"diff_norm": 1.0, "flow_norm_pxy": 0.1},
            "optimizer": {"method": "Adam", "n_iter": 6},
            "generative_ml": {"weight_loss_by_event_hist": False,
                              "weight_sigma": 5,
                              "weight_loss_by_inverse_event_hist": True,
                              "optimize_warp": True, "iwe_sigma": 2,
                              "no_polarity": False, "model_image": "current",
                              "use_log_intensity": False,
                              "poisson_model": True},
            "patch_eklt": {"patch_size": 4, "sliding_window": 2,
                           "do_event_thresholding": False, "event_thres": 8,
                           "coarsest_patch_size": 16, "finest_patch_size": 8},
        }
        cfg.update(solver_extra)
        return solver_collections["patch_eklt_pyramid2"](
            (H, W), (H, W), solver_config=cfg, visualize_module=None)

    def test_empty_ndarray_batch_through_facade(self, frame):
        solv = self._facade()
        ev, period = solv.preprocess(np.zeros((0, 4)))
        assert period == 0.0
        flow = solv.estimate(ev, frame=frame)
        assert np.isfinite(flow).all()

    def test_capacity_bucketing_reuses_jit(self, frame):
        """Windows of different sizes land in power-of-two buckets — the
        jit cache must hold one entry per bucket, not per window."""
        solv = self._facade()
        rng = np.random.default_rng(4)

        def batch(n):
            return np.stack([rng.uniform(0, H, n), rng.uniform(0, W, n),
                             np.sort(rng.uniform(0, 1, n)),
                             rng.integers(0, 2, n).astype(float)], 1)

        for n in (3000, 3500, 4000):  # all pad to the 4096 bucket
            ev, _ = solv.preprocess(batch(n))
            solv.estimate(ev, frame=frame)
        assert len(solv._jitted) == 1

    def test_flow_error_with_empty_event_mask(self, frame):
        solv = self._facade()
        pred = np.zeros((2, H, W), np.float32)
        gt = np.ones((2, H, W), np.float32)
        roi = {"xmin": 0, "xmax": H, "ymin": 0, "ymax": W}
        err = solv.calculate_flow_error(pred, gt,
                                        events=np.zeros((0, 4)), roi=roi)
        assert set(err) >= {"EPE", "AE"}  # empty mask → defined (NaN-free or
        # NaN by convention) without raising
