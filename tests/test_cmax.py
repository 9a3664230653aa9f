"""Tests for the contrast-maximization solver family."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from event_based_bos_tpu import events_from_ndarray
from event_based_bos_tpu.ops.iwe import bilinear_vote
from event_based_bos_tpu.ops.warp import warp_event_2dof, calculate_reftime
from event_based_bos_tpu.solver.cmax import (
    CmaxSpec,
    contrast_loss,
    estimate_frame_cmax,
    solve_cmax_dense,
    solve_cmax_translation,
)

H, W = 48, 64


def moving_edge_events(vx, vy, n=6000, seed=0):
    """Events from a rigidly translating dot pattern (no aperture problem)."""
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 1, n))
    x0 = rng.choice(np.arange(6, H - 14, 4), n).astype(float)
    y0 = rng.choice(np.arange(6, W - 14, 5), n).astype(float)
    x = x0 + vx * t + rng.normal(0, 0.1, n)
    y = y0 + vy * t + rng.normal(0, 0.1, n)
    p = np.ones(n)
    return np.stack([x, y, t, p], 1)


class TestTranslationCmax:
    def test_recovers_motion_adam(self):
        vx, vy = 4.0, -6.0
        evn = moving_edge_events(vx, vy)
        ev = events_from_ndarray(evn)
        spec = CmaxSpec(image_size=(H, W), motion_model="2d-translation",
                        n_iter=200, lr=0.5, iwe_sigma=1.0)
        motion, res = solve_cmax_translation(ev, jax.random.PRNGKey(0), spec)
        m = np.asarray(motion)
        # warp that sharpens = −true displacement
        np.testing.assert_allclose(m, [-vx, -vy], atol=1.0)

    def test_sampler_and_lbfgs(self):
        vx, vy = 3.0, 5.0
        evn = moving_edge_events(vx, vy, seed=1)
        ev = events_from_ndarray(evn)
        spec_s = CmaxSpec(image_size=(H, W), motion_model="2d-translation",
                          method="grid", n_iter=400,
                          param_bounds=((-10, 10), (-10, 10)))
        m_s, _ = solve_cmax_translation(ev, jax.random.PRNGKey(0), spec_s)
        np.testing.assert_allclose(np.asarray(m_s), [-vx, -vy], atol=1.5)

        spec_l = CmaxSpec(image_size=(H, W), motion_model="2d-translation",
                          method="BFGS", n_iter=60)
        m0 = jnp.asarray(np.asarray(m_s), spec_l.dtype)
        m_l, _ = solve_cmax_translation(ev, jax.random.PRNGKey(0), spec_l,
                                        x0=m0)
        np.testing.assert_allclose(np.asarray(m_l), [-vx, -vy], atol=1.0)

    def test_contrast_improves(self):
        evn = moving_edge_events(5.0, 2.0, seed=2)
        ev = events_from_ndarray(evn)
        spec = CmaxSpec(image_size=(H, W), motion_model="2d-translation",
                        n_iter=150, lr=0.5)
        motion, res = solve_cmax_translation(ev, jax.random.PRNGKey(0), spec)
        ref_time = calculate_reftime(ev, "middle")
        iwe0 = bilinear_vote(ev, (H, W))
        warped = warp_event_2dof(ev, motion, ref_time, normalize_t=True)
        iwe1 = bilinear_vote(warped, (H, W))
        assert float(jnp.var(iwe1)) > 1.5 * float(jnp.var(iwe0))

    def test_gradient_magnitude_cost(self):
        evn = moving_edge_events(4.0, 0.0, seed=3)
        ev = events_from_ndarray(evn)
        spec = CmaxSpec(image_size=(H, W), motion_model="2d-translation",
                        contrast_weights=(("gradient_magnitude", 1.0),),
                        n_iter=200, lr=0.5)
        motion, _ = solve_cmax_translation(ev, jax.random.PRNGKey(0), spec)
        np.testing.assert_allclose(np.asarray(motion), [-4.0, 0.0], atol=1.2)


class TestDenseCmax:
    @pytest.mark.parametrize("time_bins", [16, 0])
    def test_dense_estimate_runs_and_sharpens(self, time_bins):
        evn = moving_edge_events(3.0, -4.0, n=10000, seed=4)
        ev = events_from_ndarray(evn)
        spec = CmaxSpec(image_size=(H, W), motion_model="dense-flow",
                        coarsest_patch=32, finest_patch=16, n_iter=160,
                        lr=0.5, smoothness=0.02, time_bins=time_bins,
                        warp_radius=3)
        flow, aux = estimate_frame_cmax(ev, None, jax.random.PRNGKey(0), spec)
        assert flow.shape == (2, H, W)
        f = np.asarray(flow)
        # dense-flow warp uses x − dt·flow: sharpening flow ≈ +v
        assert abs(np.median(f[0]) - 3.0) < 1.5, np.median(f[0])
        assert abs(np.median(f[1]) + 4.0) < 1.5, np.median(f[1])

    def test_binned_iwe_matches_event_warp(self):
        """Binned stencil IWE ≈ per-event warped IWE for uniform flow."""
        from event_based_bos_tpu.ops.warp import warp_event_dense_flow
        from event_based_bos_tpu.ops.warp import calculate_reftime
        from event_based_bos_tpu.ops.iwe import bilinear_vote
        from event_based_bos_tpu.solver.cmax import binned_histograms, binned_iwe

        evn = moving_edge_events(2.0, -1.0, n=8000, seed=6)
        ev = events_from_ndarray(evn)
        spec = CmaxSpec(image_size=(H, W), time_bins=64, warp_radius=2,
                        iwe_sigma=1.0)
        hists, dts = binned_histograms(ev, spec)
        flow = jnp.broadcast_to(jnp.array([2.0, -1.0])[:, None, None],
                                (2, H, W))
        iwe_binned = binned_iwe(hists, dts, flow, spec)
        ref_time = calculate_reftime(ev, "middle")
        warped = warp_event_dense_flow(ev, flow, ref_time, normalize_t=True)
        from event_based_bos_tpu.ops.iwe import gaussian_blur

        iwe_exact = gaussian_blur(bilinear_vote(warped, (H, W)), 1.0,
                                  mode="reflect")
        corr = np.corrcoef(np.asarray(iwe_binned).ravel(),
                           np.asarray(iwe_exact).ravel())[0, 1]
        assert corr > 0.95, corr

    def test_facade(self):
        from event_based_bos_tpu.solver import collections

        evn = moving_edge_events(2.0, 2.0, seed=5)
        cfg = {"filter": {"filters": None,
                          "parameters": {"xmin": 0, "xmax": H, "ymin": 0,
                                         "ymax": W}},
               "method": "contrast_maximization",
               "motion_model": "2d-translation",
               "optimizer": {"method": "Adam", "n_iter": 120, "lr": 0.5}}
        solv = collections["contrast_maximization"]((H, W), (H, W), {}, cfg,
                                                    None)
        flow = solv.estimate(evn, None)
        assert flow.shape == (2, H, W)
        np.testing.assert_allclose(flow[:, 0, 0], [2.0, 2.0], atol=1.2)


def test_shift_matrix_matches_warp():
    from event_based_bos_tpu.ops.image_warp import (shift_image_matrix,
                                                    warp_image_shift)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (20, 26)))
    for shift in ([1.3, -2.7], [0.0, 0.0], [-7.5, 11.2]):
        a = shift_image_matrix(img, jnp.asarray(shift))
        b = warp_image_shift(img, jnp.asarray(shift))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_translation_binned_matches_exact():
    evn = moving_edge_events(4.0, -6.0, seed=7)
    ev = events_from_ndarray(evn)
    exact = CmaxSpec(image_size=(H, W), motion_model="2d-translation",
                     n_iter=150, lr=0.5, time_bins=0)
    binned = CmaxSpec(image_size=(H, W), motion_model="2d-translation",
                      n_iter=150, lr=0.5, time_bins=32)
    m_e, _ = solve_cmax_translation(ev, jax.random.PRNGKey(0), exact)
    m_b, _ = solve_cmax_translation(ev, jax.random.PRNGKey(0), binned)
    np.testing.assert_allclose(np.asarray(m_b), [-4.0, 6.0], atol=1.0)
    np.testing.assert_allclose(np.asarray(m_b), np.asarray(m_e), atol=1.0)


def test_param_bounds_respected_all_paths():
    """param_bounds clip the quasi-Newton and first-order iterates (the true
    optimum here lies outside the box)."""
    evn = moving_edge_events(6.0, -6.0, seed=8)
    ev = events_from_ndarray(evn)
    box = ((-2.0, 2.0), (-2.0, 2.0))
    for method in ("Adam", "BFGS"):
        spec = CmaxSpec(image_size=(H, W), motion_model="2d-translation",
                        n_iter=80, lr=0.5, method=method, param_bounds=box)
        m, _ = solve_cmax_translation(ev, jax.random.PRNGKey(0), spec)
        m = np.asarray(m)
        assert (m >= -2.0 - 1e-6).all() and (m <= 2.0 + 1e-6).all(), (method, m)


def test_lbfgs_reports_real_best_iter():
    from event_based_bos_tpu.optim import run_lbfgs

    obj = lambda x: jnp.sum((x - 3.0) ** 2)
    res = run_lbfgs(obj, jnp.zeros((2,)), n_iter=25)
    # converged run: the best iterate is late, not the hardcoded 0, and
    # best_iter always indexes the history
    assert 0 < int(res.best_iter) <= 24
    np.testing.assert_allclose(np.asarray(res.param), 3.0, atol=1e-3)
    assert float(res.history[int(res.best_iter)]) <= float(res.history[0])


def test_binned_accuracy_envelope_vs_warp_radius():
    """Accuracy envelope of the binned objective: the stencil warp is exact
    while the per-bin shift |dt·flow| stays within warp_radius — for
    direction "middle" that is |flow| <= 2*warp_radius.  Beyond it the
    binned IWE degrades (shifts are truncated to the stencil support)."""
    from event_based_bos_tpu.ops.iwe import gaussian_blur
    from event_based_bos_tpu.ops.warp import (calculate_reftime,
                                              warp_event_dense_flow)
    from event_based_bos_tpu.solver.cmax import binned_histograms, binned_iwe

    spec = CmaxSpec(image_size=(H, W), time_bins=64, warp_radius=2,
                    iwe_sigma=1.0)

    def corr_at(v):
        evn = moving_edge_events(v, 0.0, n=8000, seed=9)
        ev = events_from_ndarray(evn)
        hists, dts = binned_histograms(ev, spec)
        flow = jnp.broadcast_to(jnp.array([v, 0.0])[:, None, None], (2, H, W))
        iwe_b = binned_iwe(hists, dts, flow, spec)
        ref_time = calculate_reftime(ev, "middle")
        warped = warp_event_dense_flow(ev, flow, ref_time, normalize_t=True)
        iwe_e = gaussian_blur(bilinear_vote(warped, (H, W)), 1.0,
                              mode="reflect")
        return np.corrcoef(np.asarray(iwe_b).ravel(),
                           np.asarray(iwe_e).ravel())[0, 1]

    inside_small, inside_edge = corr_at(1.0), corr_at(3.5)   # |flow| < 2r=4
    outside = corr_at(8.0)                                   # shift 4 > r=2
    assert inside_small > 0.95, inside_small
    assert inside_edge > 0.95, inside_edge
    assert outside < inside_edge, (outside, inside_edge)


def test_translation_accepts_wider_bounds_block():
    """A GML-style 4-entry optimizer.parameters block must not crash the
    2-DoF translation path (bounds truncate to the leading pair)."""
    evn = moving_edge_events(2.0, -2.0, n=2000, seed=10)
    ev = events_from_ndarray(evn)
    spec = CmaxSpec(image_size=(H, W), motion_model="2d-translation",
                    n_iter=20, lr=0.5, method="Adam",
                    param_bounds=((-5, 5),) * 4)
    m, _ = solve_cmax_translation(ev, jax.random.PRNGKey(0), spec)
    m = np.asarray(m)
    assert m.shape == (2,) and (np.abs(m) <= 5 + 1e-6).all()
