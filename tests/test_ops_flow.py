"""Tests for flow utilities, voxelization, Poisson, PIV, stats, costs."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from event_based_bos_tpu import events_from_ndarray
from event_based_bos_tpu.ops.flow import (
    burgers_step,
    calculate_flow_error,
    construct_dense_flow_voxel,
    convert_flow_per_bin_to_flow_per_sec,
    generate_dense_optical_flow,
    generate_uniform_optical_flow,
    propagate_flow_bilinear,
    propagate_flow_griddata,
    truncate_voxel_flow,
    upwind_step,
)
from event_based_bos_tpu.ops.poisson import poisson_reconstruct
from event_based_bos_tpu.ops.stats import charbonnier_loss, gaussian_1d, ssim
from event_based_bos_tpu.ops.voxel import (
    create_event_voxel,
    generate_discretized_event_volume,
)

from reference_harness import load_reference, reference_available

needs_reference = pytest.mark.skipif(not reference_available(),
                                     reason="reference tree not mounted")


class TestFlowBasics:
    def test_generators(self):
        f = generate_dense_optical_flow(jax.random.PRNGKey(0), (8, 10), 5.0)
        assert f.shape == (2, 8, 10) and float(jnp.abs(f).max()) <= 5.0
        u = generate_uniform_optical_flow((4, 6), 2.0, -3.0)
        assert float(u[0, 0, 0]) == 2.0 and float(u[1, 3, 5]) == -3.0

    def test_convert_and_truncate(self):
        f = jnp.ones((3, 2, 4, 4))
        out = convert_flow_per_bin_to_flow_per_sec(f, jnp.full((3, 1), 2.0), 3)
        np.testing.assert_allclose(np.asarray(out), 0.5)
        vox = jnp.stack([jnp.ones((2, 4, 4)), jnp.zeros((2, 4, 4)),
                         3 * jnp.ones((2, 4, 4))])
        mean = truncate_voxel_flow(vox)
        np.testing.assert_allclose(np.asarray(mean), 2.0, rtol=1e-5)

    def test_flow_error_perfect_match(self):
        gt = jnp.ones((1, 2, 6, 8))
        err = calculate_flow_error(gt, gt)
        assert float(err["EPE"]) < 1e-6
        assert float(err["1PE"]) == 0.0
        assert float(err["AE"]) < 1e-3

    def test_flow_error_masks_invalid_gt(self):
        gt = np.ones((1, 2, 6, 8))
        gt[:, :, :3] = 0  # zero rows are excluded from evaluation
        pred = np.zeros((1, 2, 6, 8))
        err = calculate_flow_error(jnp.asarray(gt), jnp.asarray(pred))
        np.testing.assert_allclose(float(err["EPE"]), np.sqrt(2), rtol=1e-4)
        np.testing.assert_allclose(float(err["1PE"]), 1.0, rtol=1e-4)


@needs_reference
class TestFlowParityWithReference:
    @pytest.fixture(scope="class")
    def ref_flow_utils(self):
        load_reference()
        from src.utils import flow_utils

        return flow_utils

    @pytest.fixture()
    def flow(self):
        rng = np.random.default_rng(0)
        return rng.uniform(-2, 2, (2, 12, 16))

    def test_upwind_step(self, ref_flow_utils, flow):
        for dt in (0.1, -0.1):
            want = ref_flow_utils.upwind_flow_to_voxel_numpy(flow.copy(), dt)
            got = upwind_step(jnp.asarray(flow), dt)
            np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_burgers_step(self, ref_flow_utils, flow):
        for dt in (0.1, -0.1):
            want = ref_flow_utils.inviscid_burger_flow_to_voxel_numpy(
                flow.copy(), dt)
            got = burgers_step(jnp.asarray(flow), dt)
            np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_propagate_bilinear(self, ref_flow_utils, flow):
        want = ref_flow_utils.propagate_flow_to_voxel_numpy(flow.copy(), 0.5,
                                                            "bilinear")
        got = propagate_flow_bilinear(jnp.asarray(flow), 0.5)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    @pytest.mark.parametrize("method", ["nearest", "linear", "cubic"])
    def test_propagate_griddata(self, ref_flow_utils, flow, method):
        want = ref_flow_utils.propagate_flow_to_voxel_numpy(flow.copy(), 0.4,
                                                            method)
        got = propagate_flow_griddata(flow, 0.4, method)
        np.testing.assert_allclose(got, want, atol=1e-8)
        # linear/cubic leave NaN outside the convex hull, like the reference
        finite = np.isfinite(want)
        assert np.isfinite(got)[finite].all()

    def test_griddata_voxel_scheme(self, flow):
        got = construct_dense_flow_voxel(jnp.asarray(flow), 3, "nearest",
                                         "first")
        assert got.shape == (3, 2, 12, 16)
        np.testing.assert_allclose(np.asarray(got[0]), flow, atol=1e-6)

    @pytest.mark.parametrize("scheme", ["upwind", "burgers"])
    @pytest.mark.parametrize("t0", ["first", "middle"])
    def test_voxel_construction(self, ref_flow_utils, flow, scheme, t0):
        # Non-PDE schemes are not parity-tested: the reference's
        # propagate-based voxel path crashes on a shape bug
        # (``flow_utils.py:152-154`` passes the batched [1,2,H,W] array into
        # ``propagate_flow_to_voxel_numpy`` which unpacks 3 dims).
        want = ref_flow_utils.construct_dense_flow_voxel_numpy(
            flow.copy(), 4, scheme, t0)
        got = construct_dense_flow_voxel(jnp.asarray(flow), 4, scheme, t0)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_voxel_construction_same_scheme_fixed(self, flow):
        """The 'same'/'bilinear' schemes work here (reference dead path)."""
        got = construct_dense_flow_voxel(jnp.asarray(flow), 4, "same", "first")
        assert got.shape == (4, 2, 12, 16)
        for b in range(4):
            np.testing.assert_allclose(np.asarray(got[b]), flow, atol=1e-6)
        got_b = construct_dense_flow_voxel(jnp.asarray(flow), 2, "bilinear",
                                           "first")
        assert np.isfinite(np.asarray(got_b)).all()

    def test_error_metrics_match(self, ref_flow_utils):
        rng = np.random.default_rng(1)
        gt = rng.uniform(-3, 3, (2, 2, 10, 12))
        pred = gt + rng.normal(0, 1.0, gt.shape)
        want = ref_flow_utils.calculate_flow_error_numpy(gt, pred)
        got = calculate_flow_error(jnp.asarray(gt), jnp.asarray(pred))
        for k in want:
            np.testing.assert_allclose(float(got[k]), float(want[k]),
                                       rtol=1e-5, err_msg=k)


@needs_reference
class TestVoxelParity:
    def test_event_voxel_matches_reference(self):
        import torch

        load_reference()
        from src.utils import event_utils as ref_eu

        rng = np.random.default_rng(0)
        n = 1000
        x = rng.uniform(0, 19, n)     # framework row
        y = rng.uniform(0, 29, n)     # framework col
        t = np.sort(rng.uniform(0, 1, n))
        p = rng.integers(0, 2, n) * 2.0 - 1.0
        # reference signature: x is width direction
        want = ref_eu.create_event_voxel(
            torch.from_numpy(y), torch.from_numpy(x), torch.from_numpy(p),
            torch.from_numpy(t), (4, 20, 30)).numpy()
        ev = events_from_ndarray(np.stack([x, y, t, p], 1), dtype=jnp.float64)
        got = create_event_voxel(ev, (4, 20, 30))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_discretized_volume_matches_reference(self):
        import torch

        load_reference()
        from src.utils import event_utils as ref_eu

        rng = np.random.default_rng(1)
        n = 500
        evn = np.stack([
            rng.integers(0, 20, n).astype(float),
            rng.integers(0, 30, n).astype(float),
            np.sort(rng.uniform(0, 1, n)),
            rng.integers(0, 2, n) * 2.0 - 1.0,
        ], 1)
        want = ref_eu.generate_discretized_event_volume(
            torch.from_numpy(evn), (6, 20, 30)).numpy()
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        got = generate_discretized_event_volume(ev, (6, 20, 30))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


class TestPoisson:
    def test_matches_scipy_reference_implementation(self):
        from scipy import fftpack

        rng = np.random.default_rng(0)
        h, w = 18, 26
        gradx = rng.normal(size=(h, w))
        grady = rng.normal(size=(h, w))
        boundary = np.zeros((h, w))

        # independent numpy oracle of the documented DST solve
        gyy = grady[1:, :-1] - grady[:-1, :-1]
        gxx = gradx[:-1, 1:] - gradx[:-1, :-1]
        f = np.zeros_like(boundary)
        f[:-1, 1:] += gxx
        f[1:, :-1] += gyy
        rhs = f[1:-1, 1:-1]
        tt = fftpack.dst(rhs, norm="ortho")
        fsin = fftpack.dst(tt.T, norm="ortho").T
        x, y = np.meshgrid(range(1, rhs.shape[1] + 1), range(1, rhs.shape[0] + 1))
        denom = (2 * np.cos(np.pi * x / (rhs.shape[1] + 2)) - 2) + (
            2 * np.cos(np.pi * y / (rhs.shape[0] + 2)) - 2)
        interior = fftpack.idst((fftpack.idst((fsin / denom), norm="ortho").T),
                                norm="ortho").T
        want = boundary.copy()
        want[1:-1, 1:-1] = interior

        got = poisson_reconstruct(jnp.asarray(grady), jnp.asarray(gradx),
                                  jnp.asarray(boundary))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-8)

    def test_integrates_gradient_of_smooth_field(self):
        h, w = 32, 40
        gy, gx = np.mgrid[0:h, 0:w] / 10.0
        pot = np.sin(gy) * np.cos(gx)
        dyy = np.gradient(pot, axis=0)
        dxx = np.gradient(pot, axis=1)
        rec = np.asarray(poisson_reconstruct(jnp.asarray(dyy), jnp.asarray(dxx),
                                             jnp.asarray(pot)))
        inner = (slice(4, -4), slice(4, -4))
        # discretization schemes differ (central-diff gradients vs the
        # solver's one-sided stencil): require structural agreement
        corr = np.corrcoef(rec[inner].ravel(), pot[inner].ravel())[0, 1]
        assert corr > 0.99, corr


class TestStats:
    def test_gaussian_1d(self):
        from scipy.stats import norm

        v = gaussian_1d(1.0, 2.0, jnp.asarray([0.0, 1.0, 3.0]))
        want = norm.pdf([0.0, 1.0, 3.0], 1.0, 2.0)
        np.testing.assert_allclose(np.asarray(v), want, rtol=1e-6)

    def test_charbonnier(self):
        d = jnp.asarray([0.0, 1.0])
        v = float(charbonnier_loss(d))
        want = np.mean((np.array([0.0, 1.0]) ** 2 + 1e-6) ** 0.45)
        np.testing.assert_allclose(v, want, rtol=1e-5)

    def test_ssim_identity(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (1, 1, 20, 24)))
        assert float(ssim(img, img)) > 0.99
        noisy = img + 0.5 * jnp.asarray(rng.normal(size=(1, 1, 20, 24)))
        assert float(ssim(img, noisy)) < 0.6


class TestPIV:
    def test_recovers_known_shift(self):
        from event_based_bos_tpu.piv import piv_multipass
        from event_based_bos_tpu.utils.config import PivSettings

        rng = np.random.default_rng(0)
        base = rng.uniform(0, 255, (96, 128)).astype(np.float32)
        import scipy.ndimage as ndi

        base = ndi.gaussian_filter(base, 1.0)
        shift_r, shift_c = 3.0, -2.0
        moved = ndi.shift(base, (shift_r, shift_c), order=1, mode="nearest")
        settings = PivSettings(windowsizes=(64, 32), overlap=(32, 16),
                               smoothn=False)
        flow = piv_multipass(base, moved, settings)
        # channel 0 = column displacement, channel 1 = row displacement
        inner = (slice(24, 72), slice(32, 96))
        assert abs(np.median(flow[0][inner]) - shift_c) < 0.5, \
            np.median(flow[0][inner])
        assert abs(np.median(flow[1][inner]) - shift_r) < 0.5, \
            np.median(flow[1][inner])


class TestPIVAccuracy:
    """Quantitative PIV validation on classic synthetic particle pairs."""

    @staticmethod
    def _render_particles(pos, shape, sigma=1.2):
        img = np.zeros(shape)
        rr, cc = np.mgrid[0:shape[0], 0:shape[1]].astype(float)
        for r, c in pos:
            m = (np.abs(rr - r) < 5) & (np.abs(cc - c) < 5)
            img[m] += np.exp(-((rr[m] - r) ** 2 + (cc[m] - c) ** 2)
                             / (2 * sigma**2))
        return 255.0 * img / max(img.max(), 1e-9)

    def _pair(self, disp_fn, shape=(128, 160), n=900, seed=3):
        rng = np.random.default_rng(seed)
        pos = np.stack([rng.uniform(4, shape[0] - 4, n),
                        rng.uniform(4, shape[1] - 4, n)], 1)
        a = self._render_particles(pos, shape)
        moved = pos + np.stack([disp_fn(pos)[:, 0], disp_fn(pos)[:, 1]], 1)
        b = self._render_particles(moved, shape)
        return a, b

    def test_uniform_displacement_subtenth_pixel(self):
        from event_based_bos_tpu.piv import piv_multipass
        from event_based_bos_tpu.utils.config import PivSettings

        dr, dc = 2.3, -1.7
        a, b = self._pair(lambda p: np.tile([[dr, dc]], (len(p), 1)))
        settings = PivSettings(windowsizes=(64, 32), overlap=(32, 16),
                               smoothn=False)
        flow = piv_multipass(a, b, settings)
        inner = (slice(32, 96), slice(32, 128))
        err_c = np.abs(flow[0][inner] - dc).mean()
        err_r = np.abs(flow[1][inner] - dr).mean()
        assert err_r < 0.1 and err_c < 0.1, (err_r, err_c)

    def test_linear_shear_subtenth_pixel(self):
        from event_based_bos_tpu.piv import piv_multipass
        from event_based_bos_tpu.utils.config import PivSettings

        H_, W_ = 128, 160

        def disp(p):
            # column displacement growing linearly with row: du_c/dr = 0.02
            return np.stack([np.full(len(p), 0.8),
                             0.02 * (p[:, 0] - H_ / 2)], 1)

        a, b = self._pair(disp, shape=(H_, W_))
        settings = PivSettings(windowsizes=(64, 32), overlap=(32, 16),
                               smoothn=False)
        flow = piv_multipass(a, b, settings)
        rr = np.mgrid[0:H_, 0:W_][0].astype(float)
        gt_c = 0.02 * (rr - H_ / 2)
        inner = (slice(32, 96), slice(32, 128))
        err_c = np.abs(flow[0][inner] - gt_c[inner]).mean()
        err_r = np.abs(flow[1][inner] - 0.8).mean()
        assert err_r < 0.1 and err_c < 0.1, (err_r, err_c)

    def test_smoothn_matches_garcia_dct_formula(self):
        """``piv.smoothn`` == an independent scipy.fft implementation of
        Garcia-2010 (the algorithm behind OpenPIV's ``smoothn.smoothn`` with
        a fixed ``s`` and uniform weights — the configuration the reference
        uses, ``frame_utils.py:253-255`` with ``smoothn_p = 0.05``)."""
        import scipy.fft as sfft

        from event_based_bos_tpu.piv import smoothn

        rng = np.random.default_rng(5)
        y = rng.normal(size=(17, 23))
        s = 0.05
        n, m = y.shape
        lam = ((-2 + 2 * np.cos(np.pi * np.arange(n) / n))[:, None]
               + (-2 + 2 * np.cos(np.pi * np.arange(m) / m))[None, :])
        want = sfft.idctn((1 / (1 + s * lam**2)) * sfft.dctn(y, norm="ortho"),
                          norm="ortho")
        got = np.asarray(smoothn(jnp.asarray(y), s))
        np.testing.assert_allclose(got, want, atol=1e-5)
        # smoothing properties: constants are fixed points; noise shrinks
        # monotonically with s
        const = np.asarray(smoothn(jnp.full((12, 12), 3.5), 1.0))
        np.testing.assert_allclose(const, 3.5, atol=1e-5)
        r1 = np.asarray(smoothn(jnp.asarray(y), 0.05)).std()
        r2 = np.asarray(smoothn(jnp.asarray(y), 5.0)).std()
        assert r2 < r1 < y.std()

    def test_smoothn_pass_schedule_matches_reference(self, monkeypatch):
        """OpenPIV smooths the FIRST pass unconditionally (so a single-pass
        run IS smoothed, ``frame_utils.py:253-255``) and later passes only
        when more follow (``:289-291``).  Regression: the single-pass case
        used to skip smoothing entirely."""
        from event_based_bos_tpu import piv as piv_mod
        from event_based_bos_tpu.utils.config import PivSettings

        calls = []
        orig = piv_mod.smoothn
        monkeypatch.setattr(piv_mod, "smoothn",
                            lambda *a, **k: calls.append(1) or orig(*a, **k))

        dr, dc = 1.5, -0.9
        a, b = TestPIVAccuracy()._pair(
            lambda p: np.tile([[dr, dc]], (len(p), 1)), shape=(96, 96),
            n=500)
        # single pass: smoothed once per component (u, v)
        piv_mod.piv_multipass(a, b, PivSettings(windowsizes=(32,),
                                                overlap=(16,), smoothn=True))
        assert len(calls) == 2, calls
        # two passes: first smoothed, final not — still 2 calls
        calls.clear()
        piv_mod.piv_multipass(a, b, PivSettings(windowsizes=(32, 16),
                                                overlap=(16, 8),
                                                smoothn=True))
        assert len(calls) == 2, calls
        # three passes: first two smoothed, final not — 4 calls
        calls.clear()
        piv_mod.piv_multipass(a, b, PivSettings(windowsizes=(32, 16, 16),
                                                overlap=(16, 8, 8),
                                                smoothn=True))
        assert len(calls) == 4, calls

    def test_piv_with_smoothn_still_subtenth_pixel(self):
        """``smoothn: true`` (the reference's shipped PIV default,
        ``config_utils.py:223``) keeps the multipass accuracy on the uniform
        particle-pair fixture — smoothing between passes must not bias a
        uniform field."""
        from event_based_bos_tpu.piv import piv_multipass
        from event_based_bos_tpu.utils.config import PivSettings

        dr, dc = 2.3, -1.7
        a, b = self._pair(lambda p: np.tile([[dr, dc]], (len(p), 1)))
        settings = PivSettings(windowsizes=(64, 32), overlap=(32, 16),
                               smoothn=True, smoothn_p=0.05)
        flow = piv_multipass(a, b, settings)
        inner = (slice(32, 96), slice(32, 128))
        err_c = np.abs(flow[0][inner] - dc).mean()
        err_r = np.abs(flow[1][inner] - dr).mean()
        assert err_r < 0.1 and err_c < 0.1, (err_r, err_c)

    def test_replace_localmean_iterative_erosion(self):
        """Hole filling erodes inward per round (OpenPIV replace_nans
        semantics), with the global-mean fallback for unfilled cells."""
        from event_based_bos_tpu.piv import _replace_localmean

        u = jnp.ones((9, 9)) * 4.0
        v = jnp.ones((9, 9)) * -2.0
        bad = np.zeros((9, 9), bool)
        bad[2:7, 2:7] = True  # 5x5 hole: needs >=2 localmean rounds (k=1)
        u = jnp.where(jnp.asarray(bad), 99.0, u)
        one_u, _ = _replace_localmean(u, v, jnp.asarray(bad), 1, 1)
        # after ONE round the hole interior falls back to the global mean of
        # valid cells — not the border-propagated value
        assert abs(float(one_u[4, 4]) - 4.0) < 1e-5
        two_u, two_v = _replace_localmean(u, v, jnp.asarray(bad), 3, 1)
        np.testing.assert_allclose(np.asarray(two_u), 4.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(two_v), -2.0, atol=1e-5)
