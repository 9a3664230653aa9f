"""Tests for all four solver families + the user-facing API facade."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from event_based_bos_tpu import events_from_ndarray
from event_based_bos_tpu.solver import (
    GenerativeSpec,
    GmlSpec,
    PatchSpec,
    collections,
    estimate_frame_dependent,
    estimate_frame_gml,
    estimate_frame_patch,
)
from event_based_bos_tpu.solver.api import SolverBase

from reference_harness import synthetic_scene

H, W = 64, 96


@pytest.fixture(scope="module")
def scene():
    return synthetic_scene(H, W, du=(1.5, -0.8), n=20000)


def _gen(**kw):
    base = dict(image_size=(H, W), iwe_sigma=2.0,
                weight_by_inverse_event_hist=False, optimize_warp=True,
                poisson_model=False, angle_model=False,
                cost_weights=(("diff_norm", 1.0), ("flow_norm_pxy", 0.1)))
    base.update(kw)
    return GenerativeSpec(**base)


class TestGmlSolver:
    def test_recovers_direction_adam(self, scene):
        I1, _, events = scene
        gen = _gen()
        spec = GmlSpec(gen=gen, roi=(0, H, 0, W), method="Adam", n_iter=250,
                       lr=0.05)
        ev = events_from_ndarray(events)
        flow, aux = estimate_frame_gml(ev, jnp.asarray(I1),
                                       jax.random.PRNGKey(0), spec)
        # fitted velocity ∝ −du (reference convention)
        v = np.asarray(flow[:, 0, 0])
        du = np.array([1.5, -0.8])
        cos = v @ (-du) / (np.linalg.norm(v) * np.linalg.norm(du) + 1e-9)
        assert cos > 0.9, (v, cos)

    def test_lbfgs_runs(self, scene):
        I1, _, events = scene
        spec = GmlSpec(gen=_gen(), roi=(0, H, 0, W), method="BFGS", n_iter=40)
        ev = events_from_ndarray(events)
        # the all-zero init is a stationary point of the normalized
        # objective; start slightly off it (the reference's scipy path has
        # the same property)
        x0 = jnp.array([0.1, -0.1, 0.0, 0.0], jnp.float32)
        flow, aux = estimate_frame_gml(ev, jnp.asarray(I1),
                                       jax.random.PRNGKey(0), spec, x0=x0)
        assert np.isfinite(np.asarray(flow)).all()
        assert float(aux["loss"]) < float(np.asarray(aux["history"])[0])

    def test_sampler_random(self, scene):
        I1, _, events = scene
        gen = _gen(optimize_warp=False,
                   cost_weights=(("diff_norm", 1.0),))
        spec = GmlSpec(gen=gen, roi=(0, H, 0, W), method="random", n_iter=128,
                       param_bounds=((-3, 3), (-3, 3)))
        ev = events_from_ndarray(events)
        flow, aux = estimate_frame_gml(ev, jnp.asarray(I1),
                                       jax.random.PRNGKey(1), spec)
        v = np.asarray(flow[:, 0, 0])
        du = np.array([1.5, -0.8])
        cos = v @ (-du) / (np.linalg.norm(v) * np.linalg.norm(du) + 1e-9)
        assert cos > 0.7, (v, cos)


class TestPatchSolvers:
    def test_independent_tiled(self, scene):
        I1, _, events = scene
        gen = _gen(angle_model=True, optimize_warp=False,
                   cost_weights=(("diff_norm", 1.0),))
        spec = PatchSpec(gen=gen, roi=(0, H, 0, W), patch_size=32,
                         sliding_window=32, n_iter=60, lr=0.05)
        ev = events_from_ndarray(events)
        flow, aux = estimate_frame_patch(ev, jnp.asarray(I1),
                                         jax.random.PRNGKey(0), spec)
        assert flow.shape == (2, H, W)
        assert np.isfinite(np.asarray(flow)).all()
        # angle model: unit-norm direction per patch; check direction of the
        # mean vs the truth
        v = np.asarray(flow).mean(axis=(1, 2))
        du = np.array([1.5, -0.8])
        cos = v @ (-du) / (np.linalg.norm(v) * np.linalg.norm(du) + 1e-9)
        assert cos > 0.7, (v, cos)

    def test_joint_dependent(self, scene):
        I1, _, events = scene
        gen = _gen(poisson_model=True,
                   cost_weights=(("diff_norm", 1.0),
                                 ("image_gradient", 0.5),
                                 ("flow_norm_pxy", 0.1)))
        spec = PatchSpec(gen=gen, roi=(0, H, 0, W), patch_size=16,
                         sliding_window=16, n_iter=50)
        ev = events_from_ndarray(events)
        flow, aux = estimate_frame_dependent(ev, jnp.asarray(I1),
                                             jax.random.PRNGKey(0), spec)
        assert flow.shape == (2, H, W)
        hist = np.asarray(aux["history"])
        assert hist[-1] < hist[0]


class TestApiFacade:
    def _config(self, method):
        return {
            "filter": {"filters": None,
                       "parameters": {"xmin": 0, "xmax": H, "ymin": 0,
                                      "ymax": W}},
            "method": method,
            "outer_padding": 0,
            "cost_with_weight": {"diff_norm": 1.0, "image_gradient": 0.5,
                                 "flow_norm_pxy": 0.1},
            "optimizer": {"method": "Adam", "n_iter": 24,
                          "parameters": {"angle": {"min": 0, "max": 6.2832},
                                         "p_x": {"min": -0.4, "max": 0.4},
                                         "p_y": {"min": -0.4, "max": 0.4}}},
            "generative_ml": {"weight_loss_by_event_hist": False,
                              "weight_sigma": 5,
                              "weight_loss_by_inverse_event_hist": True,
                              "optimize_warp": True, "iwe_sigma": 2,
                              "viz_diff_scale": [-0.25, 0.25],
                              "no_polarity": False, "model_image": "current",
                              "use_log_intensity": False,
                              "poisson_model": True},
            "patch_eklt": {"patch_size": 16, "sliding_window": 16,
                           "do_event_thresholding": False, "event_thres": 8,
                           "coarsest_patch_size": 16, "finest_patch_size": 8},
        }

    @pytest.mark.parametrize("name", ["patch_eklt_pyramid2",
                                      "patch_eklt_dependent"])
    def test_facade_estimate(self, scene, name):
        I1, _, events = scene
        solv = collections[name]((H, W), (H, W), {}, self._config(name), None)
        filtered, period = solv.preprocess(events)
        flow = solv.estimate(filtered, None, frame=I1, background=I1)
        assert flow.shape == (2, H, W)
        assert np.isfinite(flow).all()
        err = solv.calculate_flow_error(flow, flow)
        assert err["EPE"] < 1e-6

    def test_fwl_works(self, scene):
        I1, _, events = scene
        solv = SolverBase((H, W), (H, W), {},
                          {"filter": {"filters": None,
                                      "parameters": {"xmin": 0, "xmax": H,
                                                     "ymin": 0, "ymax": W}}})
        flow = np.zeros((2, H, W))
        fwl = solv.calculate_fwl(flow, events)
        assert np.isfinite(fwl["FWL"]) and abs(fwl["FWL"] - 1.0) < 1e-3

    def test_physical_convention_negates(self, scene):
        I1, _, events = scene
        cfg = self._config("patch_eklt_pyramid2")
        solv_ref = collections["patch_eklt_pyramid2"]((H, W), (H, W), {},
                                                      dict(cfg), None)
        cfg2 = dict(cfg)
        cfg2["flow_convention"] = "physical"
        cfg2["seed"] = 0
        cfg["seed"] = 0
        solv_phys = collections["patch_eklt_pyramid2"]((H, W), (H, W), {},
                                                       cfg2, None)
        f_ref = solv_ref.estimate(events, None, frame=I1, background=I1)
        f_phys = solv_phys.estimate(events, None, frame=I1, background=I1)
        np.testing.assert_allclose(f_phys, -f_ref, atol=1e-6)


def test_warm_start_sequence(scene):
    """Pyramid facade with warm_start chains previous-frame params."""
    I1, I2, events = scene
    cfg = TestApiFacade()._config("patch_eklt_pyramid2")
    cfg["warm_start"] = True
    solv = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)
    f1 = solv.estimate(events, None, frame=I1, background=I1)
    assert solv.previous_frame_best_estimation is not None
    f2 = solv.estimate(events, None, frame=I2, background=I1)
    assert np.isfinite(f2).all()


def test_gml_facade_optuna_style_config(scene):
    """YAML optimizer method 'optuna' + sampler maps to the batched sampler."""
    I1, _, events = scene
    cfg = {
        "filter": {"filters": None,
                   "parameters": {"xmin": 0, "xmax": H, "ymin": 0, "ymax": W}},
        "method": "generative_max_likelihood",
        "outer_padding": 0,
        "cost_with_weight": {"diff_norm": 1.0},
        "optimizer": {"method": "optuna", "sampler": "random", "n_iter": 64,
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
    flow = solv.estimate(events, None, frame=I1, background=I1)
    assert flow.shape == (2, H, W) and np.isfinite(flow).all()


@pytest.mark.parametrize("model_image", ["background", "black"])
def test_model_image_variants(scene, model_image):
    I1, I2, events = scene
    cfg = TestApiFacade()._config("patch_eklt_pyramid2")
    cfg["generative_ml"] = dict(cfg["generative_ml"], model_image=model_image)
    solv = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)
    flow = solv.estimate(events, None, frame=I1, background=I2)
    assert np.isfinite(flow).all()


def test_no_polarity_mode(scene):
    I1, _, events = scene
    cfg = TestApiFacade()._config("patch_eklt_pyramid2")
    cfg["generative_ml"] = dict(cfg["generative_ml"], no_polarity=True)
    solv = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)
    flow = solv.estimate(events, None, frame=I1, background=I1)
    assert np.isfinite(flow).all()


def test_restrict_to_roi_mode(scene):
    """ROI-restricted objective agrees with the full-frame objective."""
    import dataclasses

    from event_based_bos_tpu.solver import GenerativeSpec, PyramidSpec
    from event_based_bos_tpu.solver.pyramid import estimate_frame, roi_mask

    I1, _, events = scene
    ev = events_from_ndarray(events)
    gen = GenerativeSpec(image_size=(H, W), iwe_sigma=2.0,
                         weight_by_inverse_event_hist=True,
                         optimize_warp=True, poisson_model=True)
    roi = (0, H, 16, 80)
    full = PyramidSpec(gen=gen, roi=roi, coarsest_patch=16, finest_patch=8,
                       n_iter=40)
    fast = dataclasses.replace(full, restrict_to_roi=True)
    mask = jnp.asarray(roi_mask(full))
    key = jax.random.PRNGKey(0)
    f_full, _ = estimate_frame(ev, jnp.asarray(I1, jnp.float32), mask, key,
                               full)
    f_fast, _ = estimate_frame(ev, jnp.asarray(I1, jnp.float32), mask, key,
                               fast)
    a = np.asarray(f_full)[:, :, 16:80]
    b = np.asarray(f_fast)[:, :, 16:80]
    assert np.isfinite(b).all()
    # exact-ROI semantics: full-frame measurement normalization, area-scaled
    # mean costs, mask ridge inside the box — only the prediction-norm
    # domain differs (box vs frame), so agreement is near-bitwise
    # (was corr ~0.84 with the old ROI-normalized approximation)
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.97, corr


def test_restrict_to_roi_with_event_hist_weights(scene):
    """The outside-box norm correction must fold the event-hist weight map
    (w² into the gradient products) when ``weight_by_event_hist`` is on —
    the prediction is weighted BEFORE its norm (``gml:531-575``)."""
    import dataclasses

    from event_based_bos_tpu.solver import GenerativeSpec, PyramidSpec
    from event_based_bos_tpu.solver.pyramid import estimate_frame, roi_mask

    I1, _, events = scene
    ev = events_from_ndarray(events)
    gen = GenerativeSpec(image_size=(H, W), iwe_sigma=2.0,
                         weight_by_event_hist=True,
                         weight_by_inverse_event_hist=True,
                         optimize_warp=True, poisson_model=True)
    roi = (0, H, 16, 80)
    full = PyramidSpec(gen=gen, roi=roi, coarsest_patch=16, finest_patch=8,
                       n_iter=40)
    fast = dataclasses.replace(full, restrict_to_roi=True,
                               roi_norm_stride=2)
    mask = jnp.asarray(roi_mask(full))
    key = jax.random.PRNGKey(0)
    f_full, aux_f = estimate_frame(ev, jnp.asarray(I1, jnp.float32), mask,
                                   key, full)
    f_fast, aux_r = estimate_frame(ev, jnp.asarray(I1, jnp.float32), mask,
                                   key, fast)
    # first-iteration losses start from the SAME params: the corrected
    # normalizer must put them within a few percent of the full-frame loss
    l0_full = float(np.asarray(aux_f["loss_history"][0])[0])
    l0_fast = float(np.asarray(aux_r["loss_history"][0])[0])
    assert abs(l0_fast - l0_full) / l0_full < 0.05, (l0_full, l0_fast)
    a = np.asarray(f_full)[:, :, 16:80]
    b = np.asarray(f_fast)[:, :, 16:80]
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.95, corr


def test_restrict_to_roi_plain_model_finite(scene):
    """Regression: the exact-ROI normalizer (prediction norm + outside-box
    correction) used a plain sqrt — with the plain (u, v) velocity model
    both terms are exactly zero at the zero init, so iteration 0
    back-propagated NaN and the whole solve returned NaN flow."""
    from event_based_bos_tpu.solver import GenerativeSpec, PyramidSpec
    from event_based_bos_tpu.solver.pyramid import estimate_frame, roi_mask

    I1, _, events = scene
    ev = events_from_ndarray(events)
    gen = GenerativeSpec(image_size=(H, W), iwe_sigma=2.0,
                         optimize_warp=False, poisson_model=False,
                         cost_weights=(("diff_norm", 1.0),
                                       ("image_gradient", 0.5),
                                       ("flow_norm", 0.1)))
    spec = PyramidSpec(gen=gen, roi=(0, H, 16, 80), coarsest_patch=16,
                       finest_patch=8, n_iter=12, restrict_to_roi=True)
    mask = jnp.asarray(roi_mask(spec))
    flow, aux = estimate_frame(ev, jnp.asarray(I1, jnp.float32), mask,
                               jax.random.PRNGKey(0), spec)
    assert np.isfinite(np.asarray(flow)).all()
    for hist in aux["loss_history"]:  # one entry per pyramid scale
        assert np.isfinite(np.asarray(hist)).all()


def test_restrict_to_roi_inv_weight_matches_full_frame(scene):
    """An "inv"-weighted mean cost must keep its FULL-FRAME mean divisor
    under restrict_to_roi (via the ("inv", area_scale) weight form) — the
    box mean is ~2x the full-frame mean for this ROI, which used to shift
    the reciprocal term by the same factor."""
    import dataclasses

    from event_based_bos_tpu.solver import GenerativeSpec, PyramidSpec
    from event_based_bos_tpu.solver.pyramid import estimate_frame, roi_mask

    I1, _, events = scene
    ev = events_from_ndarray(events)
    gen = GenerativeSpec(image_size=(H, W), iwe_sigma=2.0,
                         weight_by_inverse_event_hist=True,
                         optimize_warp=True, poisson_model=True,
                         cost_weights=(("diff_norm", 1.0),
                                       ("image_gradient", "inv"),
                                       ("flow_norm_pxy", 0.1)))
    full = PyramidSpec(gen=gen, roi=(0, H, 16, 80), coarsest_patch=16,
                       finest_patch=8, n_iter=40)
    fast = dataclasses.replace(full, restrict_to_roi=True)
    mask = jnp.asarray(roi_mask(full))
    key = jax.random.PRNGKey(0)
    f_full, aux_f = estimate_frame(ev, jnp.asarray(I1, jnp.float32), mask,
                                   key, full)
    f_fast, aux_r = estimate_frame(ev, jnp.asarray(I1, jnp.float32), mask,
                                   key, fast)
    l0_full = float(np.asarray(aux_f["loss_history"][0]).ravel()[0])
    l0_fast = float(np.asarray(aux_r["loss_history"][0]).ravel()[0])
    assert abs(l0_fast - l0_full) / abs(l0_full) < 0.05, (l0_full, l0_fast)
    a = np.asarray(f_full)[:, :, 16:80]
    b = np.asarray(f_fast)[:, :, 16:80]
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.95, corr


def test_restrict_to_roi_tv_charbonnier_match_full_frame(scene):
    """total_variation and charbonnier under restrict_to_roi keep full-frame
    semantics via arg["full_domain"] (TV's per-axis divisors and
    charbonnier's ε-floor constant are not representable as an area-scaled
    weight) — first-iteration losses from identical params must agree."""
    import dataclasses

    from event_based_bos_tpu.solver import GenerativeSpec, PyramidSpec
    from event_based_bos_tpu.solver.pyramid import estimate_frame, roi_mask

    I1, _, events = scene
    ev = events_from_ndarray(events)
    gen = GenerativeSpec(image_size=(H, W), iwe_sigma=2.0,
                         weight_by_inverse_event_hist=True,
                         optimize_warp=True, poisson_model=True,
                         cost_weights=(("diff_norm", 1.0),
                                       ("total_variation", 5.0),
                                       ("charbonnier", 2.0)))
    full = PyramidSpec(gen=gen, roi=(0, H, 16, 80), coarsest_patch=16,
                       finest_patch=8, n_iter=40)
    fast = dataclasses.replace(full, restrict_to_roi=True)
    mask = jnp.asarray(roi_mask(full))
    key = jax.random.PRNGKey(0)
    f_full, aux_f = estimate_frame(ev, jnp.asarray(I1, jnp.float32), mask,
                                   key, full)
    f_fast, aux_r = estimate_frame(ev, jnp.asarray(I1, jnp.float32), mask,
                                   key, fast)
    l0_full = float(np.asarray(aux_f["loss_history"][0]).ravel()[0])
    l0_fast = float(np.asarray(aux_r["loss_history"][0]).ravel()[0])
    assert abs(l0_fast - l0_full) / abs(l0_full) < 0.05, (l0_full, l0_fast)
    a = np.asarray(f_full)[:, :, 16:80]
    b = np.asarray(f_fast)[:, :, 16:80]
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.95, corr


@pytest.mark.parametrize("restart_mode", ["map", "vmap"])
def test_multistart_selects_best_loss_restart(scene, restart_mode):
    """``n_restarts: R`` runs the pyramid solve over R random inits and
    returns the restart with the lowest finest-scale loss — identical to
    running each key separately and picking the argmin by hand, in both
    execution strategies (sequential ``lax.map`` lanes, the default, and
    batched ``vmap`` lanes)."""
    import dataclasses

    from event_based_bos_tpu.solver import GenerativeSpec, PyramidSpec
    from event_based_bos_tpu.solver.pyramid import estimate_frame, roi_mask

    I1, _, events = scene
    ev = events_from_ndarray(events)
    gen = GenerativeSpec(image_size=(H, W), iwe_sigma=2.0,
                         weight_by_inverse_event_hist=True,
                         optimize_warp=True, poisson_model=True)
    single = PyramidSpec(gen=gen, roi=(0, H, 0, W), coarsest_patch=16,
                         finest_patch=8, n_iter=24)
    multi = dataclasses.replace(single, n_restarts=3,
                                restart_mode=restart_mode)
    mask = jnp.asarray(roi_mask(single))
    frame = jnp.asarray(I1, jnp.float32)
    key = jax.random.PRNGKey(7)

    flow_multi, aux_multi = jax.jit(
        lambda e, f, m, k: estimate_frame(e, f, m, k, multi))(
            ev, frame, mask, key)

    manual = []
    for k in jax.random.split(key, 3):
        fl, aux = estimate_frame(ev, frame, mask, k, single)
        manual.append((float(jnp.min(aux["loss_history"][-1])), np.asarray(fl)))
    best_loss, best_flow = min(manual, key=lambda t: t[0])
    assert float(jnp.min(aux_multi["loss_history"][-1])) == pytest.approx(
        best_loss, rel=1e-5)
    np.testing.assert_allclose(np.asarray(flow_multi), best_flow,
                               rtol=2e-4, atol=2e-5)


def test_model_image_e2vid(scene, tmp_path):
    """model_image "e2vid" pulls the reconstruction nearest the frame time.

    The reference whitelists the token (``gml:22``) but never sets a frame
    for it; here the mode is wired through the E2VID loader.
    """
    import cv2

    I1, I2, events = scene
    seq = tmp_path / "E2VID" / "seq0"
    seq.mkdir(parents=True)
    recon = (np.arange(H * W, dtype=np.uint8).reshape(H, W) % 251)
    cv2.imwrite(str(seq / "frame_0000.png"), np.zeros((H, W), np.uint8))
    cv2.imwrite(str(seq / "frame_0001.png"), recon)
    np.savetxt(seq / "timestamps.txt", [0.0, 0.004])
    with open(seq / "events.csv", "w") as f:
        f.write("0,0,1,0.0\n0,0,1,0.008\n")

    cfg = TestApiFacade()._config("patch_eklt_pyramid2")
    cfg["generative_ml"] = dict(
        cfg["generative_ml"], model_image="e2vid",
        e2vid={"root": str(tmp_path), "dataset": "E2VID", "sequence": "seq0",
               "height": H, "width": W})
    solv = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)
    model = solv._model_frame({"frame": I1, "frame_time": 0.005})
    np.testing.assert_array_equal(model, recon)
    flow = solv.estimate(events, None, frame=I1, background=I2,
                         frame_time=0.005)
    assert np.isfinite(flow).all()

    # without a loader config, an E2VID main loader's frame is used as-is
    cfg2 = TestApiFacade()._config("patch_eklt_pyramid2")
    cfg2["generative_ml"] = dict(cfg2["generative_ml"], model_image="e2vid")
    solv2 = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg2, None)
    np.testing.assert_array_equal(solv2._model_frame({"frame": I1}),
                                  np.asarray(I1))


def test_pxpy_as_anglemagn_unfold_and_solve(scene):
    """(p_magn, p_angle) warp parameterization (``gml:130-135,144-161``)."""
    from event_based_bos_tpu.solver.generative import unfold_scalar_params

    spec = _gen(pxpy_as_anglemagn=True)
    theta = jnp.asarray([0.5, -0.25, 2.0, 0.7])
    vx, vy, pxy = unfold_scalar_params(theta, spec)
    assert float(vx) == pytest.approx(0.5) and float(vy) == pytest.approx(-0.25)
    assert float(pxy[0]) == pytest.approx(2.0 * np.sin(0.7), rel=1e-6)
    assert float(pxy[1]) == pytest.approx(2.0 * np.cos(0.7), rel=1e-6)

    I1, _, events = scene
    ev = events_from_ndarray(events)
    gml = GmlSpec(gen=spec, roi=(0, H, 0, W), method="Adam", n_iter=24)
    flow, aux = jax.jit(
        lambda e, f, k: estimate_frame_gml(e, f, k, spec=gml))(
            ev, jnp.asarray(I1, jnp.float32), jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(flow)).all()


def test_debug_evolution_video(scene, tmp_path):
    """record_evolution produces per-iteration opt_prediction/opt_measured
    frames and an assembled video (the LossVideosMaker analogue,
    ``gml:39-82`` / ``patch_eklt_dependent.py:139-176``)."""
    import os

    from event_based_bos_tpu.visualizer import Visualizer

    I1, _, events = scene
    viz = Visualizer((H, W), show=False, save=True, save_dir=str(tmp_path))
    cfg = TestApiFacade()._config("patch_eklt_pyramid2")
    cfg["record_evolution"] = 4
    solv = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, viz)
    assert solv.spec.record_evolution == 4
    flow = solv.estimate(events, None, frame=I1, background=I1)
    assert np.isfinite(flow).all()
    evo_dir = tmp_path / "0"
    preds = list(evo_dir.glob("opt_prediction*.png"))
    assert len(preds) >= 2, list(evo_dir.iterdir())
    # diff view with the viz_diff_scale color scale (``gml:388-396``)
    assert len(list(evo_dir.glob("opt_diff*.png"))) == len(preds)
    assert (evo_dir / "opt_prediction.mp4").exists()
    assert (evo_dir / "opt_measured.mp4").exists()
    assert (evo_dir / "opt_diff.mp4").exists()

    # GML facade path
    cfg2 = TestApiFacade()._config("generative_max_likelihood")
    cfg2["record_evolution"] = 6
    cfg2["generative_ml"] = dict(cfg2["generative_ml"], poisson_model=False)
    viz2 = Visualizer((H, W), show=False, save=True,
                      save_dir=str(tmp_path / "gml"))
    solv2 = collections["generative_max_likelihood"]((H, W), (H, W), {}, cfg2,
                                                     viz2)
    flow2 = solv2.estimate(events, None, frame=I1, background=I1)
    assert np.isfinite(flow2).all()
    gml_dir = tmp_path / "gml" / "0"
    assert list(gml_dir.glob("opt_prediction*.png"))


def test_steady_n_iter_shortens_warm_frames(scene):
    """``steady_n_iter`` runs frame 0 at the full schedule and warm-started
    frames at the shortened one (measured rationale: docs/performance.md
    §schedule scaling, tools/warmstart_probe.py)."""
    I1, I2, events = scene
    cfg = TestApiFacade()._config("patch_eklt_pyramid2")
    cfg["warm_start"] = True
    cfg["steady_n_iter"] = 12
    solv = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)
    f1 = solv.estimate(events, None, frame=I1, background=I1)
    hist_cold = [np.asarray(h) for h in solv._last_aux["loss_history"]]
    assert solv.previous_frame_best_estimation is not None
    f2 = solv.estimate(events, None, frame=I2, background=I1)
    hist_warm = [np.asarray(h) for h in solv._last_aux["loss_history"]]
    # full n_iter=24 over 2 scales -> finest 24//2 = 12 steps;
    # steady n_iter=12 -> finest 12//2 = 6 steps
    assert len(hist_cold[-1]) == 12 and len(hist_warm[-1]) == 6
    assert np.isfinite(f1).all() and np.isfinite(f2).all()
    # the warm frame keeps feeding the chain
    assert solv.previous_frame_best_estimation is not None


def test_steady_n_iter_validation(scene):
    cfg = TestApiFacade()._config("patch_eklt_pyramid2")
    cfg["steady_n_iter"] = 12  # no warm_start
    with pytest.raises(ValueError, match="warm_start"):
        collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)
    cfg["warm_start"] = True
    cfg["steady_n_iter"] = 0
    with pytest.raises(ValueError, match="steady_n_iter"):
        collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)


def test_restrict_to_roi_rejects_small_margin():
    """The exact-ROI cost equivalence needs the mask ridge and its
    difference stencil inside the cropped box (margin >= 2); a smaller
    margin must fail loudly instead of silently optimizing a different
    objective."""
    cfg = TestApiFacade()._config("patch_eklt_pyramid2")
    cfg["restrict_to_roi"] = True
    cfg["roi_margin"] = 1
    with pytest.raises(ValueError, match="roi_margin"):
        collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)


def test_prewarm_traces_the_real_programs_dtype(scene):
    """Regression: prewarm must build its dummy events with the solver's
    compute dtype (``precision: "64"``) — an f32-traced prewarm program
    would never be reused by the f64 real frames, re-paying the compile +
    first-execution stall the feature exists to hide."""
    from event_based_bos_tpu.types import bucket_capacity

    I1, _, events = scene
    cfg = TestApiFacade()._config("patch_eklt_pyramid2")
    cfg["precision"] = "64"
    solv = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)
    cap = bucket_capacity(len(events))
    solv.prewarm(cap)
    solv.estimate(events, None, frame=I1, background=I1)
    # one jit entry total: the real frame hit the prewarmed executable
    assert solv._jitted[(cap, False)]._cache_size() == 1


@pytest.mark.parametrize("steady", [None, 12])
def test_prewarm_covers_the_warm_frame_program(scene, steady):
    """Regression: warm frames execute a different program (prev_params
    None → array is a new jit trace; ``steady_n_iter`` swaps the spec too).
    prewarm must dispatch that program as well — otherwise the
    first-execution stall resurfaces on frame 1, exactly where the warm
    chain is supposed to start paying off."""
    from event_based_bos_tpu.types import bucket_capacity

    I1, _, events = scene
    cfg = TestApiFacade()._config("patch_eklt_pyramid2")
    cfg["warm_start"] = True
    if steady is not None:
        cfg["steady_n_iter"] = steady
    solv = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)
    cap = bucket_capacity(len(events))
    solv.prewarm(cap)
    sizes = {k: fn._cache_size() for k, fn in solv._jitted.items()}
    if steady is None:
        assert sizes == {(cap, False): 2}  # cold + warm variant
    else:
        assert sizes == {(cap, False): 1, (cap, True): 1}
    solv.estimate(events, None, frame=I1, background=I1)  # cold frame 0
    solv.estimate(events, None, frame=I1, background=I1)  # warm frame 1
    # no new traces: both real frames hit prewarmed executables
    assert {k: fn._cache_size() for k, fn in solv._jitted.items()} == sizes


def test_render_bundle_folded_errors_match_standalone(scene):
    """The error pair folded into the render bundle (``err_crop``) must
    equal the standalone :meth:`calculate_flow_errors` dispatch on the
    ROI-cropped unscaled flows — both the device-flow path (pyramid
    facade) and the host-flow fallback."""
    I1, _, events = scene
    cfg = TestApiFacade()._config("patch_eklt_pyramid2")
    solv = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)
    filtered, _ = solv.preprocess(events)
    handle = solv.estimate_async(filtered, None, frame=I1, background=I1)
    estimation = handle.result()
    scale = 1.7
    est_scaled = estimation * scale
    rng = np.random.default_rng(0)
    gt = rng.uniform(-1, 1, (2, H, W)).astype(np.float32)
    crop = (4, H - 4, 8, W - 8)
    roi = {"xmin": crop[0], "xmax": crop[1], "ymin": crop[2],
           "ymax": crop[3]}
    want = solv.calculate_flow_errors(
        estimation[:, crop[0]:crop[1], crop[2]:crop[3]],
        gt[:, crop[0]:crop[1], crop[2]:crop[3]], filtered, roi)

    for dev in (handle.device_flow, None):
        b = solv.render_bundle(filtered, est_scaled, gt, est_device=dev,
                               est_scale=scale, err_crop=crop)
        for got_d, want_d in zip(b["errors"], want):
            assert set(got_d) == set(want_d)
            for k in want_d:
                assert abs(got_d[k] - want_d[k]) <= 1e-5 * (
                    1.0 + abs(want_d[k])), (dev is None, k, got_d[k],
                                            want_d[k])


def test_render_bundle_gt_crop_program_equivalence(scene):
    """round-5: the cropped-GT-upload render bundle (``gt_cropped=True`` —
    the caller ships only the evaluation box and the program zero-pads)
    must be BITWISE equal to the full-frame-upload program on a GT that is
    zero outside the box, artifacts and folded errors alike."""
    from event_based_bos_tpu.solver import programs

    I1, _, events = scene
    cfg = TestApiFacade()._config("patch_eklt_pyramid2")
    solv = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)
    filtered, _ = solv.preprocess(events)
    ev = solv._to_events(filtered)
    rng = np.random.default_rng(0)
    est = rng.uniform(-1, 1, (2, H, W)).astype(np.float32)
    crop = (0, H, 8, W - 8)
    x0, x1, y0, y1 = crop
    gt = np.zeros((2, H, W), np.float32)
    gt[:, x0:x1, y0:y1] = rng.uniform(-1, 1, (2, x1 - x0, y1 - y0))
    args = (jnp.asarray(1.0, jnp.float32), jnp.asarray(1.3, jnp.float32),
            jnp.asarray(1.0, jnp.float32))
    full = programs.jit_render_bundle((H, W), crop, False)(
        ev, jnp.asarray(est), jnp.asarray(gt), *args)
    cropped = programs.jit_render_bundle((H, W), crop, True)(
        ev, jnp.asarray(est), jnp.asarray(gt[:, x0:x1, y0:y1]), *args)
    # gt_cropped also crops the GT polar-plane fetch (round-5 bundle
    # shrink): rebuild the full planes from the box + the program-computed
    # outside constant before comparing
    ang_c, mag_c, ang_k, mag_k = cropped[5]
    ang = np.full((H, W), np.asarray(ang_k).reshape(()), np.uint8)
    mag = np.full((H, W), np.asarray(mag_k).reshape(()), np.float16)
    ang[x0:x1, y0:y1] = np.asarray(ang_c)
    mag[x0:x1, y0:y1] = np.asarray(mag_c)
    cropped = cropped[:5] + ((ang, mag),) + cropped[6:]
    flat_f, tree_f = jax.tree_util.tree_flatten(full)
    flat_c, tree_c = jax.tree_util.tree_flatten(cropped)
    assert tree_f == tree_c
    for a, b in zip(flat_f, flat_c):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_render_bundle_gt_crop_engages_only_on_zero_padded_gt(scene,
                                                              monkeypatch):
    """The facade takes the cropped-GT upload iff the GT is verifiably zero
    outside the evaluation box (the CLI's ``frame_flow`` padding); any real
    data outside keeps the full upload so non-CLI callers stay exact."""
    from event_based_bos_tpu.solver import programs

    I1, _, events = scene
    cfg = TestApiFacade()._config("patch_eklt_pyramid2")
    solv = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)
    filtered, _ = solv.preprocess(events)
    handle = solv.estimate_async(filtered, None, frame=I1, background=I1)
    handle.result()
    seen = []
    real = programs.jit_render_bundle

    def spy(image_shape, err_crop=None, gt_cropped=False, est_box=None,
            pack_mask=False):
        seen.append(gt_cropped)
        return real(image_shape, err_crop, gt_cropped, est_box, pack_mask)

    monkeypatch.setattr(programs, "jit_render_bundle", spy)
    rng = np.random.default_rng(1)
    crop = (0, H, 8, W - 8)
    gt_padded = np.zeros((2, H, W), np.float32)
    gt_padded[:, :, 8:W - 8] = rng.uniform(-1, 1, (2, H, W - 16))
    solv.render_bundle(filtered, None, gt_padded,
                       est_device=handle.device_flow, est_scale=1.0,
                       err_crop=crop)
    gt_dirty = np.array(gt_padded)
    gt_dirty[0, 0, 0] = 0.5  # real data outside the box
    solv.render_bundle(filtered, None, gt_dirty,
                       est_device=handle.device_flow, est_scale=1.0,
                       err_crop=crop)
    # no err_crop → nothing to crop against
    solv.render_bundle(filtered, None, gt_padded,
                       est_device=handle.device_flow, est_scale=1.0)
    assert seen == [True, False, False]


@pytest.mark.parametrize("convention", ["reference", "physical"])
def test_render_bundle_shrink_bitwise_equivalence(scene, convention,
                                                  monkeypatch):
    """round-5 bundle shrink (the steady visualize loop is tunnel-byte-
    bound): the ROI-cropped polar-plane fetch (outside pixels rebuilt from
    the program-computed constant — ``physical`` exercises the −0.0
    outside value from the sign fold) and the bitpacked event mask must
    reconstruct BITWISE-equal full-frame artifacts vs the full fetch."""
    from event_based_bos_tpu.solver import api as solver_api

    I1, _, events = scene
    cfg = TestApiFacade()._config("patch_eklt_pyramid2")
    cfg["filter"]["parameters"] = {"xmin": 4, "xmax": H - 4,
                                   "ymin": 8, "ymax": W - 8}
    cfg["flow_convention"] = convention
    solv = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)
    filtered, _ = solv.preprocess(events)
    handle = solv.estimate_async(filtered, None, frame=I1, background=I1)
    handle.result()
    assert solv._est_zero_box == (4, H - 4, 8, W - 8)
    rng = np.random.default_rng(2)
    crop = (0, H, 8, W - 8)
    x0, x1, y0, y1 = crop
    gt = np.zeros((2, H, W), np.float32)
    gt[:, x0:x1, y0:y1] = rng.uniform(-1, 1, (2, x1 - x0, y1 - y0))
    kwargs = dict(est_device=handle.device_flow, est_scale=1.3,
                  err_crop=crop)
    b_new = solv.render_bundle(filtered, None, gt, **kwargs)
    monkeypatch.setattr(solver_api, "_BUNDLE_SHRINK_ENABLED", False)
    b_old = solv.render_bundle(filtered, None, gt, **kwargs)
    assert set(b_new) == set(b_old)
    for k in b_old:
        if k == "errors":
            assert b_new[k] == b_old[k]
            continue
        a, b = b_new[k], b_old[k]
        for p, q in zip(a if isinstance(a, tuple) else (a,),
                        b if isinstance(b, tuple) else (b,)):
            assert np.asarray(p).dtype == np.asarray(q).dtype, k
            np.testing.assert_array_equal(np.asarray(p), np.asarray(q), err_msg=k)
    assert np.asarray(b_new["mask"]).dtype == bool


@pytest.mark.parametrize("convention", ["reference", "physical"])
def test_flow_errors_async_matches_standalone(scene, convention):
    """The serving-mode pre-dispatched error pair
    (:meth:`SolverBase.flow_errors_async`, computed from the solve's
    device-resident unoriented flow with the orientation sign applied on
    device) must equal the standalone :meth:`calculate_flow_errors`
    dispatch on the host-oriented ROI-cropped flow."""
    I1, _, events = scene
    cfg = TestApiFacade()._config("patch_eklt_pyramid2")
    cfg["flow_convention"] = convention
    solv = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)
    filtered, _ = solv.preprocess(events)
    handle = solv.estimate_async(filtered, None, frame=I1, background=I1)
    estimation = handle.result()  # host-oriented float32 flow
    rng = np.random.default_rng(0)
    gt = rng.uniform(-1, 1, (2, H, W)).astype(np.float32)
    crop = (4, H - 4, 8, W - 8)
    roi = {"xmin": crop[0], "xmax": crop[1], "ymin": crop[2],
           "ymax": crop[3]}
    want = solv.calculate_flow_errors(
        estimation[:, crop[0]:crop[1], crop[2]:crop[3]],
        gt[:, crop[0]:crop[1], crop[2]:crop[3]], filtered, roi)
    got = solv.flow_errors_async(filtered, gt, handle.device_flow, crop)()
    for got_d, want_d in zip(got, want):
        assert set(got_d) == set(want_d)
        for k in want_d:
            assert abs(got_d[k] - want_d[k]) <= 1e-6 * (
                1.0 + abs(want_d[k])), (convention, k, got_d[k], want_d[k])


@pytest.mark.parametrize("convention", ["reference", "physical"])
def test_calculate_fwl_async_matches_standalone(scene, convention):
    """The pre-dispatched FWL (:meth:`SolverBase.calculate_fwl_async`, from
    the device-resident unoriented flow with the time rescale and the
    orientation sign folded on device) must equal :meth:`calculate_fwl` on
    the host-oriented scaled flow."""
    I1, _, events = scene
    cfg = TestApiFacade()._config("patch_eklt_pyramid2")
    cfg["flow_convention"] = convention
    solv = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)
    filtered, _ = solv.preprocess(events)
    handle = solv.estimate_async(filtered, None, frame=I1, background=I1)
    estimation = handle.result()  # host-oriented float32 flow
    scale = 1.7
    want = solv.calculate_fwl(estimation * scale, filtered)["FWL"]
    got = solv.calculate_fwl_async(filtered, handle.device_flow,
                                   scale)()["FWL"]
    assert abs(got - want) <= 1e-6 * (1.0 + abs(want)), (convention, got,
                                                         want)


class TestIweCacheDispatchSplit:
    """Round-5 IWE-cache dispatch split (VERDICT r4 #1): the events enter
    the pyramid solve only through the once-per-frame cache, so a
    precomputed ``cache=`` input must reproduce the fused solve exactly;
    on TPU the facade default runs the split with the Pallas vote
    (``docs/performance.md`` §dispatch split — measured bit-identical and
    8.5 ms/frame faster there)."""

    def _cfg(self):
        return {
            "filter": {"filters": None,
                       "parameters": {"xmin": 0, "xmax": H, "ymin": 0,
                                      "ymax": W}},
            "method": "patch_eklt_pyramid2",
            "outer_padding": 0,
            "cost_with_weight": {"diff_norm": 1.0, "flow_norm_pxy": 0.1},
            "optimizer": {"method": "Adam", "n_iter": 16},
            "generative_ml": {"weight_loss_by_event_hist": False,
                              "weight_sigma": 5,
                              "weight_loss_by_inverse_event_hist": True,
                              "optimize_warp": True, "iwe_sigma": 2,
                              "viz_diff_scale": [-0.25, 0.25],
                              "no_polarity": False, "model_image": "current",
                              "use_log_intensity": False,
                              "poisson_model": True},
            "patch_eklt": {"coarsest_patch_size": 16, "finest_patch_size": 8},
        }

    def test_estimate_frame_cache_input_bit_equal(self, scene):
        from event_based_bos_tpu.solver.generative import iwe_cache
        from event_based_bos_tpu.solver.pyramid import (PyramidSpec,
                                                        estimate_frame,
                                                        roi_mask)

        I1, _, events = scene
        spec = PyramidSpec(gen=_gen(poisson_model=True, optimize_warp=True,
                                    weight_by_inverse_event_hist=True),
                           roi=(0, H, 0, W), coarsest_patch=16,
                           finest_patch=8, n_iter=16)
        ev = events_from_ndarray(events)
        fr = jnp.asarray(I1)
        mask = jnp.asarray(roi_mask(spec))
        key = jax.random.PRNGKey(4)
        fused, _ = jax.jit(
            lambda e, f, m, k: estimate_frame(e, f, m, k, spec=spec))(
            ev, fr, mask, key)
        cache = jax.jit(lambda e: iwe_cache(e, spec.gen))(ev)
        split, _ = jax.jit(
            lambda e, f, m, k, c: estimate_frame(e, f, m, k, spec=spec,
                                                 cache=c))(
            ev, fr, mask, key, cache)
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(split))

    def test_facade_split_scatter_matches_fused(self, scene):
        I1, _, events = scene
        flows = {}
        for mode in (False, "scatter"):
            cfg = self._cfg()
            cfg["split_iwe_cache"] = mode
            solv = collections["patch_eklt_pyramid2"]((H, W), (H, W), {},
                                                      cfg, None)
            filtered, _ = solv.preprocess(events)
            flows[mode] = solv.estimate(filtered, None, frame=I1,
                                        background=I1)
        np.testing.assert_array_equal(flows[False], flows["scatter"])

    def test_facade_auto_resolves_fused_off_tpu(self, scene):
        cfg = self._cfg()
        solv = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg,
                                                  None)
        assert solv._split_iwe == "auto"
        assert solv._split_mode() is False  # conftest pins the CPU platform

    def test_split_config_validation(self):
        cfg = self._cfg()
        cfg["split_iwe_cache"] = "fast"
        with pytest.raises(ValueError, match="split_iwe_cache"):
            collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)

    def test_prewarm_matches_split_trace(self, scene):
        """Prewarming with the split enabled must compile the same program
        shape real frames run (cache tuple input), so the prewarmed entry
        is reused — asserted via the jit cache key set."""
        I1, _, events = scene
        cfg = self._cfg()
        cfg["split_iwe_cache"] = "scatter"
        solv = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg,
                                                  None)
        filtered, _ = solv.preprocess(events)
        solv.prewarm(filtered.capacity)
        fn = solv._jitted[(filtered.capacity, False)]
        n_before = fn._cache_size()
        flow = solv.estimate(filtered, None, frame=I1, background=I1)
        assert np.isfinite(flow).all()
        assert fn._cache_size() == n_before  # no re-trace on the real frame
