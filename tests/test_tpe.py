"""Tests for the sequential TPE sampler (true optuna-semantics path).

The reference drives optuna's TPESampler from the GML solver
(``generative_max_likelihood.py:215-276``); ``event_based_bos_tpu.tpe``
implements the algorithm itself (host loop + per-trial device objective).
"""

import numpy as np
import pytest

from event_based_bos_tpu.tpe import ParzenEstimator, run_tpe

from reference_harness import synthetic_scene

H, W = 64, 96


def _quadratic(x):
    c = np.array([1.2, -0.7])
    return float(((x - c) ** 2).sum())


class TestParzen:
    def test_pdf_integrates_to_one(self):
        est = ParzenEstimator(np.array([0.3, 0.5, 0.51, 2.2]), 0.0, 3.0)
        xs = np.linspace(0.0, 3.0, 20001)
        pdf = np.exp(est.log_pdf(xs))
        integral = np.trapezoid(pdf, xs)
        assert abs(integral - 1.0) < 1e-3, integral

    def test_samples_in_bounds(self):
        est = ParzenEstimator(np.array([-4.9, 4.9]), -5.0, 5.0)
        s = est.sample(np.random.default_rng(0), 5000)
        assert s.min() >= -5.0 and s.max() <= 5.0

    def test_density_concentrates_at_observations(self):
        est = ParzenEstimator(np.full(20, 1.0), -5.0, 5.0)
        near, far = est.log_pdf(np.array([1.0, -4.0]))
        assert near > far + 1.0


class TestRunTpe:
    def test_beats_random_search_on_quadratic(self):
        n = 80
        res = run_tpe(_quadratic, ([-5, -5], [5, 5]), n, seed=3)
        rng = np.random.default_rng(3)
        random_best = min(
            _quadratic(rng.uniform([-5, -5], [5, 5])) for _ in range(n))
        assert res.loss < 0.05, res.loss
        assert res.loss < random_best
        # adaptive phase must improve on the uniform warmup
        assert res.loss < min(res.history[:10])

    def test_deterministic_and_bounded(self):
        r1 = run_tpe(_quadratic, ([-2, -2], [2, 2]), 40, seed=7)
        r2 = run_tpe(_quadratic, ([-2, -2], [2, 2]), 40, seed=7)
        np.testing.assert_array_equal(r1.history, r2.history)
        assert (np.abs(r1.param) <= 2.0).all()
        assert r1.best_iter == int(np.argmin(r1.history))

    def test_single_dim(self):
        res = run_tpe(lambda x: float((x[0] - 0.5) ** 2), ([-3], [3]), 60,
                      seed=1)
        assert abs(res.param[0] - 0.5) < 0.1


@pytest.fixture(scope="module")
def scene():
    return synthetic_scene(H, W, du=(1.5, -0.8), n=20000)


def test_gml_facade_tpe_sequential(scene):
    """YAML `sampler: TPE` routes to the host-driven sequential TPE study
    (one small device program per trial, like the reference's optuna loop)."""
    from event_based_bos_tpu.solver import collections

    I1, _, events = scene
    cfg = {
        "filter": {"filters": None,
                   "parameters": {"xmin": 0, "xmax": H, "ymin": 0, "ymax": W}},
        "method": "generative_max_likelihood",
        "outer_padding": 0,
        "cost_with_weight": {"diff_norm": 1.0},
        "optimizer": {"method": "optuna", "sampler": "TPE", "n_iter": 48,
                      "parameters": {"v_x": {"min": -3, "max": 3},
                                     "v_y": {"min": -3, "max": 3}}},
        "generative_ml": {"weight_loss_by_event_hist": False,
                          "weight_sigma": 5,
                          "weight_loss_by_inverse_event_hist": False,
                          "optimize_warp": False, "iwe_sigma": 2,
                          "viz_diff_scale": [-0.25, 0.25],
                          "no_polarity": False, "model_image": "current",
                          "use_log_intensity": False, "poisson_model": False},
    }
    solv = collections["generative_max_likelihood"]((H, W), (H, W), {}, cfg,
                                                    None)
    assert solv._tpe_solver is not None
    flow = solv.estimate(events, None, frame=I1, background=I1)
    assert flow.shape == (2, H, W) and np.isfinite(flow).all()
    v = flow[:, 0, 0]
    du = np.array([1.5, -0.8])
    cos = v @ (-du) / (np.linalg.norm(v) * np.linalg.norm(du) + 1e-9)
    assert cos > 0.7, (v, cos)
