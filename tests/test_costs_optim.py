"""Tests for the cost registry and on-device optimizers."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from event_based_bos_tpu import costs
from event_based_bos_tpu.optim import (
    run_first_order,
    run_lbfgs,
    run_sampler,
)


class TestCosts:
    def test_diff_norm_is_matrix_1_norm(self):
        import torch

        rng = np.random.default_rng(0)
        a = rng.normal(size=(12, 17))
        b = rng.normal(size=(12, 17))
        got = float(costs.diff_norm({"prediction": jnp.asarray(a),
                                     "measurement": jnp.asarray(b)}))
        want = float(torch.linalg.norm(torch.from_numpy(a - b), ord=1))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_flow_norm(self):
        f = jnp.stack([3 * jnp.ones((4, 5)), 4 * jnp.ones((4, 5))])
        assert abs(float(costs.flow_norm({"flow": f})) - 5.0) < 1e-6

    def test_flow_norm_zero_gradient_safe(self):
        g = jax.grad(lambda p: costs.flow_norm_pxy({"pxy": p}))(
            jnp.zeros((2, 4, 5)))
        assert np.isfinite(np.asarray(g)).all()

    def test_image_gradient_matches_torch(self):
        import torch

        rng = np.random.default_rng(1)
        f = rng.normal(size=(2, 9, 11))
        w = rng.uniform(0.5, 1.5, (9, 11))
        got = float(costs.image_gradient({"flow": jnp.asarray(f),
                                          "weights": jnp.asarray(w),
                                          "omit_boundary": True}))
        tf = torch.from_numpy(f)
        tw = torch.from_numpy(w)
        gx = torch.gradient(tf, dim=1)[0] * tw
        gy = torch.gradient(tf, dim=2)[0] * tw
        want = float(torch.mean(torch.abs(gx) + torch.abs(gy)))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_hybrid_inv_weight_and_terms(self):
        fn = costs.hybrid_cost({"flow_norm": "inv", "diff_norm": 2.0})
        arg = {"flow": 2 * jnp.ones((2, 3, 3)),
               "prediction": jnp.ones((3, 3)),
               "measurement": jnp.zeros((3, 3))}
        total, terms = fn(arg)
        fl = float(terms["flow_norm"])
        dn = float(terms["diff_norm"])
        np.testing.assert_allclose(float(total), 1.0 / fl + 2.0 * dn, rtol=1e-6)

    def test_hybrid_scaled_inv_weight(self):
        """The internal ("inv", s) weight form adds 1/(raw*s) — used by the
        exact-ROI fast path to restore the full-frame mean inside the
        reciprocal for box-evaluated mean costs."""
        fn = costs.hybrid_cost({"flow_norm": ("inv", 0.25)})
        arg = {"flow": 2 * jnp.ones((2, 3, 3))}
        total, terms = fn(arg)
        fl = float(terms["flow_norm"])
        np.testing.assert_allclose(float(total), 1.0 / (fl * 0.25), rtol=1e-6)

    def test_total_variation_full_domain_exact(self):
        """A box-cropped field with arg["full_domain"] must reproduce the
        full-frame TV exactly: TV's dx/dy means divide by (H-1)·W and
        H·(W-1), so the single area_scale weight factor used for the H·W-mean
        costs cannot represent it (≈3% per-axis bias for a small box)."""
        rng = np.random.default_rng(7)
        h, w = 40, 60
        x0, x1, y0, y1 = 8, 32, 10, 50
        flow = np.zeros((2, h, w), np.float32)
        # support strictly inside the box (zero at the box boundary, like the
        # masked flow under restrict_to_roi with margin >= 2)
        flow[:, x0 + 2:x1 - 2, y0 + 2:y1 - 2] = rng.normal(
            size=(2, x1 - x0 - 4, y1 - y0 - 4))
        full = float(costs.total_variation({"flow": jnp.asarray(flow)}))
        crop = float(costs.total_variation(
            {"flow": jnp.asarray(flow[:, x0:x1, y0:y1]),
             "full_domain": (h, w)}))
        np.testing.assert_allclose(crop, full, rtol=1e-6)
        # and the naive area rescale is measurably wrong — the bias this
        # path exists to remove
        box = float(costs.total_variation(
            {"flow": jnp.asarray(flow[:, x0:x1, y0:y1])}))
        naive = box * ((x1 - x0) * (y1 - y0)) / (h * w)
        assert abs(naive - full) / full > 0.01

    def test_charbonnier_full_domain_exact(self):
        """Charbonnier's summand has a nonzero ε^{2α} floor where δ = 0, so
        the out-of-box pixels contribute a constant the area-scaled weight
        cannot represent; full_domain adds it in closed form."""
        rng = np.random.default_rng(8)
        h, w = 40, 60
        x0, x1, y0, y1 = 8, 32, 10, 50
        # f64 (x64 is on in tests): isolates the closed-form algebra from
        # f32 summation-order noise (~1e-6 rel between the two sum orders)
        pred = np.zeros((h, w), np.float64)
        meas = np.zeros((h, w), np.float64)
        pred[x0:x1, y0:y1] = rng.normal(size=(x1 - x0, y1 - y0))
        meas[x0:x1, y0:y1] = rng.normal(size=(x1 - x0, y1 - y0))
        full = float(costs.charbonnier(
            {"prediction": jnp.asarray(pred), "measurement": jnp.asarray(meas)}))
        crop = float(costs.charbonnier(
            {"prediction": jnp.asarray(pred[x0:x1, y0:y1]),
             "measurement": jnp.asarray(meas[x0:x1, y0:y1]),
             "full_domain": (h, w)}))
        np.testing.assert_allclose(crop, full, rtol=1e-6)

    def test_maximize_direction(self):
        fn = costs.hybrid_cost({"flow_norm": 1.0}, direction="maximize")
        total, _ = fn({"flow": jnp.ones((2, 3, 3))})
        assert float(total) < 0

    def test_required_keys(self):
        keys = costs.required_keys({"diff_norm": 1.0, "flow_norm_pxy": 0.1})
        assert "prediction" in keys and "pxy" in keys

    def test_fwl_identity(self):
        iwe = jnp.asarray(np.random.default_rng(0).uniform(0, 3, (8, 9)))
        v = costs.normalized_image_variance({"orig_iwe": iwe, "iwe": iwe})
        np.testing.assert_allclose(float(v), 1.0, rtol=1e-5)


def _quadratic(x):
    target = jnp.asarray([1.0, -2.0, 0.5])
    return jnp.sum((x - target) ** 2)


class TestOptim:
    def test_adam_converges(self):
        res = run_first_order(_quadratic, jnp.zeros(3), 600, "Adam", lr=0.05)
        np.testing.assert_allclose(np.asarray(res.param), [1.0, -2.0, 0.5],
                                   atol=0.05)
        assert res.history.shape == (600,)
        assert float(res.history[-1]) < float(res.history[0])

    @pytest.mark.parametrize("method", ["SGD", "RMSprop", "AdamW", "NAdam"])
    def test_other_first_order_methods(self, method):
        res = run_first_order(_quadratic, jnp.zeros(3), 300, method, lr=0.05)
        assert float(res.loss) < float(res.history[0])

    def test_lbfgs_converges_fast(self):
        res = run_lbfgs(_quadratic, jnp.zeros(3), 25)
        np.testing.assert_allclose(np.asarray(res.param), [1.0, -2.0, 0.5],
                                   atol=1e-3)

    def test_nelder_mead_converges_derivative_free(self):
        """The honest mapping for scipy Nelder-Mead/Powell: a simplex loop
        that never calls jax.grad — verified by using a non-differentiable
        objective a gradient method could not minimize."""
        from event_based_bos_tpu.optim import run_nelder_mead

        def kink(x):  # |.|-kinked bowl, subgradient-hostile
            return (jnp.abs(x[0] - 1.0) + jnp.abs(x[1] + 2.0)
                    + (x[2] - 0.5) ** 2)

        res = run_nelder_mead(kink, jnp.zeros(3), 600)
        # (scipy's own Nelder-Mead reaches loss 0.104 in its 300-iter budget
        # on this kink; this simplex reaches ~0 by 600)
        np.testing.assert_allclose(np.asarray(res.param), [1.0, -2.0, 0.5],
                                   atol=0.02)
        assert float(res.history[-1]) <= float(res.history[0])
        # bounds are respected
        lo = jnp.array([-0.5, -0.5, -0.5])
        hi = jnp.array([0.5, 0.5, 0.5])
        res_b = run_nelder_mead(kink, jnp.zeros(3), 200, bounds=(lo, hi))
        assert (np.abs(np.asarray(res_b.param)) <= 0.5 + 1e-6).all()

    def test_nelder_mead_x0_on_bound_not_frozen(self):
        """Regression: with x0 on its UPPER bound, the +5% perturbed vertex
        used to clip back onto x0, collapsing the simplex rank in that
        coordinate and freezing it at the bound forever."""
        from event_based_bos_tpu.optim import run_nelder_mead

        def bowl(x):
            return (x[0] - 0.2) ** 2 + (x[1] + 0.3) ** 2

        lo = jnp.array([-1.0, -1.0])
        hi = jnp.array([1.0, 1.0])
        x0 = jnp.array([1.0, 1.0])  # both coordinates start ON the bound
        res = run_nelder_mead(bowl, x0, 300, bounds=(lo, hi))
        np.testing.assert_allclose(np.asarray(res.param), [0.2, -0.3],
                                   atol=0.02)

    def test_newton_cg_quadratic_one_outer_step(self):
        """On a quadratic, one Newton step with enough CG iterations lands
        on the optimum — the defining property of the HVP path."""
        from event_based_bos_tpu.optim import run_newton_cg

        res = run_newton_cg(_quadratic, jnp.zeros(3), 3, cg_iters=10)
        np.testing.assert_allclose(np.asarray(res.param), [1.0, -2.0, 0.5],
                                   atol=1e-4)

    def test_scipy_method_routing(self):
        from event_based_bos_tpu.optim import run_scipy_method

        # gradient/HVP families converge tightly in 40 iterations; the
        # derivative-free simplex needs a larger budget for the same bowl
        for m, n, atol in (("BFGS", 40, 0.05), ("Newton-CG", 40, 0.05),
                           ("trust-constr", 40, 0.05),
                           ("Nelder-Mead", 400, 0.05), ("Powell", 400, 0.05)):
            res = run_scipy_method(_quadratic, jnp.zeros(3), n, m)
            np.testing.assert_allclose(np.asarray(res.param),
                                       [1.0, -2.0, 0.5], atol=atol,
                                       err_msg=m)

    def test_steplr_schedule(self):
        # lr drops by 10x after lr_step steps: the late iterates barely move
        res_const = run_first_order(_quadratic, jnp.zeros(3), 100, "SGD",
                                    lr=0.1, lr_step=100)
        res_decay = run_first_order(_quadratic, jnp.zeros(3), 100, "SGD",
                                    lr=0.1, lr_step=10, lr_decay=0.1,
                                    track_best=False)
        # decayed run must progress less overall
        assert float(res_decay.history[-1]) > float(res_const.history[-1])

    def test_track_best_vs_last(self):
        # noisy objective: best-iterate <= final-iterate loss
        key = jax.random.PRNGKey(0)

        def noisy(x):
            return _quadratic(x) + 0.1 * jnp.sin(37.0 * jnp.sum(x))

        best = run_first_order(noisy, jnp.zeros(3), 200, "Adam", lr=0.1,
                               track_best=True)
        last = run_first_order(noisy, jnp.zeros(3), 200, "Adam", lr=0.1,
                               track_best=False)
        assert float(noisy(best.param)) <= float(noisy(last.param)) + 1e-6

    @pytest.mark.parametrize("sampler", ["random", "grid", "TPE"])
    def test_samplers(self, sampler):
        lo = jnp.array([-3.0, -3.0, -3.0])
        hi = jnp.array([3.0, 3.0, 3.0])
        res = run_sampler(_quadratic, (lo, hi), 512, sampler,
                          jax.random.PRNGKey(0))
        assert float(res.loss) < 1.0
        assert np.isfinite(np.asarray(res.param)).all()

    def test_aux_history(self):
        def obj(x):
            return _quadratic(x), {"extra": jnp.sum(x)}

        res = run_first_order(obj, jnp.zeros(3), 50, "Adam", lr=0.05,
                              has_aux=True)
        assert res.aux_history["extra"].shape == (50,)
