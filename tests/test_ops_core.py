"""Unit tests for the core event/image kernels vs numpy/torch oracles."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from event_based_bos_tpu import Events, events_from_ndarray
from event_based_bos_tpu.ops import (
    bilinear_vote,
    count_image,
    create_eventmask,
    create_eventrate,
    create_polarity_iwe,
    crop_event,
    filter_event_by_time,
    frame_gradients,
    gaussian_blur,
    generate_events,
    get_flow_from_motion,
    normalize_time,
    poisson_to_flow,
    remove_event,
    resize_bilinear,
    reverse_event,
    sample_bilinear,
    sort_event_by_timestamp,
    split_polarity,
    warp_event,
    warp_event_2dof,
    warp_image_forward,
    warp_image_shift,
)

from oracles import (
    bilinear_vote_oracle,
    count_image_oracle,
    resize_bilinear_oracle,
    sobel_oracle,
    warp_2dof_oracle,
    warp_image_forward_oracle,
)


def make_events(n=500, h=32, w=48, seed=0, fractional=True):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, h - 1, n) if fractional else rng.integers(0, h, n).astype(float)
    y = rng.uniform(0, w - 1, n) if fractional else rng.integers(0, w, n).astype(float)
    t = np.sort(rng.uniform(0.0, 0.5, n))
    p = rng.integers(0, 2, n) * 2.0 - 1.0
    return np.stack([x, y, t, p], axis=1)


class TestBilinearVote:
    @pytest.mark.parametrize("padding", [(0, 0), (3, 5)])
    def test_matches_oracle(self, padding):
        evn = make_events()
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        got = bilinear_vote(ev, (32, 48), padding=padding)
        want = bilinear_vote_oracle(evn, (32, 48), padding=padding)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)

    def test_per_event_weights(self):
        evn = make_events()
        wts = np.random.default_rng(1).uniform(-1, 2, len(evn))
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        got = bilinear_vote(ev, (32, 48), weight=jnp.asarray(wts))
        want = bilinear_vote_oracle(evn, (32, 48), weight=wts)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)

    def test_mask_excludes_events(self):
        evn = make_events()
        ev = events_from_ndarray(evn, capacity=1000, dtype=jnp.float64)  # padded
        got = bilinear_vote(ev, (32, 48))
        want = bilinear_vote_oracle(evn, (32, 48))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)

    def test_out_of_bounds_dropped(self):
        evn = make_events()
        evn[:, 0] += 20  # push some events out of frame
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        got = bilinear_vote(ev, (32, 48))
        want = bilinear_vote_oracle(evn, (32, 48))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)

    def test_count_image(self):
        evn = make_events()
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        got = count_image(ev, (32, 48))
        want = count_image_oracle(evn, (32, 48))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)

    def test_polarity_stack(self):
        evn = make_events()
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        got = create_polarity_iwe(ev, (32, 48))
        pos = bilinear_vote_oracle(evn[evn[:, 3] > 0], (32, 48))
        neg = bilinear_vote_oracle(evn[evn[:, 3] <= 0], (32, 48))
        np.testing.assert_allclose(np.asarray(got[0]), pos, atol=1e-9)
        np.testing.assert_allclose(np.asarray(got[1]), neg, atol=1e-9)

    def test_total_mass_conserved_interior(self):
        # Events well inside the frame: votes sum to event count.
        evn = make_events()
        evn[:, 0] = np.clip(evn[:, 0], 1, 30)
        evn[:, 1] = np.clip(evn[:, 1], 1, 46)
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        got = bilinear_vote(ev, (32, 48))
        assert abs(float(got.sum()) - len(evn)) < 1e-6

    def test_differentiable_wrt_coords(self):
        evn = make_events(n=50)
        ev = events_from_ndarray(evn, dtype=jnp.float64)

        def f(x):
            return jnp.sum(bilinear_vote(ev._replace(x=x), (32, 48)) ** 2)

        g = jax.grad(f)(ev.x)
        assert np.isfinite(np.asarray(g)).all()
        # numeric check on one coordinate
        eps = 1e-6
        xp = ev.x.at[7].add(eps)
        xm = ev.x.at[7].add(-eps)
        num = (f(xp) - f(xm)) / (2 * eps)
        np.testing.assert_allclose(float(g[7]), float(num), rtol=1e-4, atol=1e-6)


class TestEventOps:
    def test_crop_remove_complement(self):
        evn = make_events()
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        c = crop_event(ev, 5, 20, 10, 40)
        r = remove_event(ev, 5, 20, 10, 40)
        assert int(c.count()) + int(r.count()) == len(evn)
        inside = (evn[:, 0] >= 5) & (evn[:, 0] < 20) & (evn[:, 1] >= 10) & (evn[:, 1] < 40)
        assert int(c.count()) == int(inside.sum())

    def test_time_filter(self):
        evn = make_events()
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        f = filter_event_by_time(ev, 0.1, 0.3)
        want = ((evn[:, 2] >= 0.1) & (evn[:, 2] < 0.3)).sum()
        assert int(f.count()) == int(want)

    def test_normalize_time(self):
        evn = make_events()
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        nev, scale = normalize_time(ev)
        t = np.asarray(nev.t)[np.asarray(nev.valid)]
        assert abs(t.min()) < 1e-12 and abs(t.max() - 1) < 1e-12
        np.testing.assert_allclose(float(scale), evn[:, 2].max() - evn[:, 2].min())

    def test_reverse_event(self):
        evn = make_events()
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        rev = reverse_event(ev)
        t = np.asarray(rev.t)
        want = np.abs(evn[:, 2].max() - evn[:, 2]) + evn[:, 2].min()
        np.testing.assert_allclose(t, want, atol=1e-12)
        np.testing.assert_allclose(np.asarray(rev.p), -evn[:, 3])

    def test_sort_by_timestamp(self):
        rng = np.random.default_rng(3)
        evn = make_events()
        evn = evn[rng.permutation(len(evn))]
        ev = events_from_ndarray(evn, capacity=600, dtype=jnp.float64)
        s = sort_event_by_timestamp(ev)
        ts = np.asarray(s.t)[: len(evn)]
        assert (np.diff(ts) >= 0).all()
        assert np.asarray(s.valid)[: len(evn)].all()
        assert not np.asarray(s.valid)[len(evn):].any()

    def test_split_polarity(self):
        evn = make_events()
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        pos, neg = split_polarity(ev)
        assert int(pos.count()) == int((evn[:, 3] > 0).sum())
        assert int(pos.count()) + int(neg.count()) == len(evn)

    def test_generate_events_shapes(self):
        ev = generate_events(jax.random.PRNGKey(0), 100, 32, 48)
        assert ev.capacity == 100
        t = np.asarray(ev.t)
        assert (np.diff(t) >= 0).all()
        assert np.asarray(ev.x).max() < 32 and np.asarray(ev.y).max() < 48


class TestWarp:
    def test_2dof_matches_oracle(self):
        evn = make_events()
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        trans = jnp.array([3.0, -2.0], jnp.float64)
        got = warp_event(ev, trans, "2d-translation", direction="first")
        want = warp_2dof_oracle(evn, [3.0, -2.0], evn[:, 2].min())
        np.testing.assert_allclose(np.asarray(got.x), want[:, 0], atol=1e-9)
        np.testing.assert_allclose(np.asarray(got.y), want[:, 1], atol=1e-9)
        np.testing.assert_allclose(np.asarray(got.t), want[:, 2], atol=1e-9)

    def test_2dof_normalized_t(self):
        evn = make_events()
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        trans = jnp.array([1.0, 1.0], jnp.float64)
        got = warp_event(ev, trans, "2d-translation", direction="middle", normalize_t=True)
        ref = evn[:, 2].min() + 0.5 * (evn[:, 2].max() - evn[:, 2].min())
        want = warp_2dof_oracle(evn, [1.0, 1.0], ref, normalize_t=True)
        np.testing.assert_allclose(np.asarray(got.x), want[:, 0], atol=1e-9)

    def test_dense_flow_uniform_equals_2dof(self):
        # A uniform dense flow must reproduce the 2-DoF warp with flipped sign.
        evn = make_events(fractional=False)
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        flow = jnp.stack([jnp.full((32, 48), 2.0), jnp.full((32, 48), -1.0)])
        got = warp_event(ev, flow.astype(jnp.float64), "dense-flow", direction="first")
        want = warp_event(ev, jnp.array([-2.0, 1.0], jnp.float64), "2d-translation",
                          direction="first")
        np.testing.assert_allclose(np.asarray(got.x), np.asarray(want.x), atol=1e-9)
        np.testing.assert_allclose(np.asarray(got.y), np.asarray(want.y), atol=1e-9)

    def test_get_flow_from_motion_roundtrip(self):
        # warp consistency: numeric densification of a translation is constant
        flow = get_flow_from_motion(jnp.array([1.5, -0.5]), "2d-translation", (8, 10))
        np.testing.assert_allclose(np.asarray(flow[0]), -1.5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(flow[1]), 0.5, atol=1e-6)

    def test_warp_sharpens_iwe_variance(self):
        # Events generated from a moving edge: warping by the true motion
        # must increase IWE contrast (the CM principle).
        rng = np.random.default_rng(0)
        n = 2000
        t = np.sort(rng.uniform(0, 1, n))
        x0 = rng.integers(5, 27, n).astype(float)
        y0 = np.full(n, 10.0)
        vx, vy = 0.0, 15.0
        evn = np.stack([x0 + vx * t, y0 + vy * t, t, np.ones(n)], 1)
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        iwe_orig = bilinear_vote(ev, (32, 48))
        warped = warp_event(ev, jnp.array([-vx, -vy], jnp.float64), "2d-translation",
                            direction="first")
        iwe_warp = bilinear_vote(warped, (32, 48))
        assert float(jnp.var(iwe_warp)) > 2 * float(jnp.var(iwe_orig))


class TestImageOps:
    def test_sobel_matches_cv2(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (24, 31))
        gx, gy = frame_gradients(jnp.asarray(img))
        wgx, wgy = sobel_oracle(img, 3, "reflect101")
        np.testing.assert_allclose(np.asarray(gx), wgx, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gy), wgy, atol=1e-3)

    def test_poisson_to_flow_matches_replicate_sobel(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(-1, 1, (12, 20))
        flow = poisson_to_flow(jnp.asarray(img))
        wgx, wgy = sobel_oracle(img, 3, "replicate")
        np.testing.assert_allclose(np.asarray(flow[0]), wgx / 8.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(flow[1]), wgy / 8.0, atol=1e-5)

    @pytest.mark.parametrize("out_shape", [(24, 40), (6, 10), (13, 17)])
    def test_resize_matches_torch(self, out_shape):
        rng = np.random.default_rng(0)
        img = rng.uniform(-1, 1, (3, 12, 20))
        got = resize_bilinear(jnp.asarray(img), out_shape)
        want = resize_bilinear_oracle(img, out_shape)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_warp_image_forward_matches_grid_sample(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (16, 22))
        flow = rng.uniform(-3, 3, (2, 16, 22))
        got = warp_image_forward(jnp.asarray(img), jnp.asarray(flow))
        want = warp_image_forward_oracle(img, flow)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_warp_image_shift(self):
        img = np.arange(30, dtype=np.float64).reshape(5, 6)
        got = warp_image_shift(jnp.asarray(img), jnp.array([1.0, 0.0]))
        # shifting content down by 1: out[r, c] = im[r-1, c]
        np.testing.assert_allclose(np.asarray(got)[1:, :], img[:-1, :], atol=1e-9)

    def test_gaussian_blur_matches_scipy(self):
        from scipy.ndimage import gaussian_filter

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (20, 28))
        got = gaussian_blur(jnp.asarray(img), 2.0, mode="symmetric")
        want = gaussian_filter(img, 2.0)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_gaussian_blur_matches_cv2(self):
        import cv2

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (20, 28))
        got = gaussian_blur(jnp.asarray(img), 2.0, mode="reflect")
        want = cv2.GaussianBlur(img, ksize=(0, 0), sigmaX=2.0)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_eventmask(self):
        evn = make_events(fractional=False)
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        mask = create_eventmask(ev, (32, 48))
        assert mask.shape == (1, 32, 48)
        for x, y, _, _ in evn[:10]:
            assert bool(mask[0, int(x), int(y)])

    def test_eventrate(self):
        # two events at one pixel, dt = 0.1 → rate 10
        evn = np.array([[3, 4, 0.0, 1], [3, 4, 0.1, 1], [5, 5, 0.2, 1]], np.float64)
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        rate = create_eventrate(ev, (8, 8))
        np.testing.assert_allclose(float(rate[3, 4]), 10.0, rtol=1e-6)
        assert float(rate[5, 5]) == 0.0

    def test_sample_bilinear_zeros_outside(self):
        img = jnp.ones((4, 4), jnp.float64)
        v = sample_bilinear(img, jnp.array([-0.5]), jnp.array([1.0]))
        np.testing.assert_allclose(np.asarray(v), [0.5])


class TestStencilWarp:
    def test_stencil_matches_gather_warp(self):
        from event_based_bos_tpu.ops.image_warp import warp_image_stencil

        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (16, 22)))
        flow = jnp.asarray(rng.uniform(-1, 1, (2, 16, 22)))
        got = warp_image_stencil(img, flow, radius=1)
        want = warp_image_forward(img, flow)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-9)

    def test_stencil_radius2(self):
        from event_based_bos_tpu.ops.image_warp import warp_image_stencil

        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 1, (16, 22)))
        flow = jnp.asarray(rng.uniform(-2, 2, (2, 16, 22)))
        got = warp_image_stencil(img, flow, radius=2)
        want = warp_image_forward(img, flow)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-9)

    def test_stencil_scalar_shift(self):
        from event_based_bos_tpu.ops.image_warp import warp_image_stencil

        img = jnp.asarray(np.arange(30, dtype=np.float64).reshape(5, 6))
        shift = jnp.array([0.7, -0.3])
        got = warp_image_stencil(img, shift, radius=1)
        want = warp_image_shift(img, shift)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-9)

    def test_stencil_gradient_flows(self):
        from event_based_bos_tpu.ops.image_warp import warp_image_stencil

        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.uniform(0, 1, (8, 10)))

        def f(u):
            flow = jnp.stack([u, -u])
            return jnp.sum(warp_image_stencil(img, flow) ** 2)

        g = jax.grad(f)(jnp.full((8, 10), 0.3))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


class TestRemainingEventOps:
    def test_search_exact_event(self):
        from event_based_bos_tpu.ops import search_exact_event

        evn = make_events(fractional=False)
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        x0, y0 = evn[0, 0], evn[0, 1]
        found = search_exact_event(ev, x0, y0)
        want = ((evn[:, 0] == x0) & (evn[:, 1] == y0)).sum()
        assert int(found.count()) == int(want)

    def test_shift_and_origin(self):
        from event_based_bos_tpu.ops import set_event_origin_to_zero, shift_event

        evn = make_events()
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        s = shift_event(ev, 2.0, -3.0)
        np.testing.assert_allclose(np.asarray(s.x), evn[:, 0] + 2)
        o = set_event_origin_to_zero(ev, 5.0, 7.0, 0.1)
        np.testing.assert_allclose(np.asarray(o.t), evn[:, 2] - 0.1)

    def test_undistort_events(self):
        from event_based_bos_tpu.ops import undistort_events

        evn = make_events(h=8, w=10, fractional=False)
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        # identity maps: map_y gives the row back, map_x the col
        gy, gx = np.mgrid[0:8, 0:10].astype(np.float64)
        out = undistort_events(ev, jnp.asarray(gx), jnp.asarray(gy), 8, 10)
        np.testing.assert_allclose(np.asarray(out.x), evn[:, 0])
        np.testing.assert_allclose(np.asarray(out.y), evn[:, 1])
        assert int(out.count()) == len(evn)

    def test_random_sample_event(self):
        from event_based_bos_tpu.ops import random_sample_event

        evn = make_events(n=2000)
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        s = random_sample_event(jax.random.PRNGKey(0), ev, 25.0)
        frac = int(s.count()) / 2000
        assert 0.18 < frac < 0.32


class TestIweVariants:
    """IWA / IWD / IWT / probability / timeimage parity vs the reference."""

    @pytest.fixture(scope="class")
    def ref_eic(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from reference_harness import load_reference, reference_available

        if not reference_available():
            pytest.skip("reference tree not mounted")
        return load_reference().event_image_converter.EventImageConverter((32, 48))

    def _pair(self):
        evn = make_events()
        rng = np.random.default_rng(5)
        per_event = rng.uniform(0.5, 2.0, len(evn))
        ev = events_from_ndarray(evn, dtype=jnp.float64)
        return evn, per_event, ev

    def test_iwa(self, ref_eic):
        from event_based_bos_tpu.ops import create_iwa

        evn, det_j, ev = self._pair()
        want = ref_eic.create_iwa(evn, det_j, sigma=1)
        got = create_iwa(ev, (32, 48), jnp.asarray(det_j), sigma=1)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_iwd(self, ref_eic):
        from event_based_bos_tpu.ops import create_iwd

        evn, div, ev = self._pair()
        want = ref_eic.create_iwd(evn, div, sigma=1)
        got = create_iwd(ev, (32, 48), jnp.asarray(div), sigma=1)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_iwt(self, ref_eic):
        from event_based_bos_tpu.ops import create_iwt

        evn, trace, ev = self._pair()
        want = ref_eic.create_iwt(evn, trace, sigma=1)
        got = create_iwt(ev, (32, 48), jnp.asarray(trace), sigma=1)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_probability_iwe(self, ref_eic):
        from event_based_bos_tpu.ops import create_probability_iwe

        evn, prob, ev = self._pair()
        want = ref_eic.create_probability_iwe(evn, prob, sigma=1)
        got = create_probability_iwe(ev, (32, 48), jnp.asarray(prob), sigma=1)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_timeimage(self, ref_eic):
        from event_based_bos_tpu.ops import create_timeimage

        evn, _, ev = self._pair()
        want = ref_eic.create_timeimage(evn, evn[:, 2], sigma=1)
        got = create_timeimage(ev, (32, 48), sigma=1)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_count_vs_reference(self, ref_eic):
        from event_based_bos_tpu.ops import create_image_from_events

        evn, _, ev = self._pair()
        want = ref_eic.create_image_from_events_numpy(evn, "count", sigma=0)
        got = create_image_from_events(ev, (32, 48), "count", sigma=0)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)


class TestPhasedUpsample:
    def test_matches_resize_matrix_exactly(self):
        import jax.numpy as jnp

        from event_based_bos_tpu.ops.image_warp import (
            resize_bilinear, upsample_bilinear_phased)

        rng = np.random.default_rng(0)
        for s, (h, w) in (((2, 2), (7, 9)), ((3, 5), (6, 4)), ((8, 8), (12, 20))):
            x = jnp.asarray(rng.uniform(-1, 1, (3, h, w)))
            want = resize_bilinear(x, (h * s[0], w * s[1]))
            got = upsample_bilinear_phased(x, s)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-6)

    def test_patch_to_dense_crop_consistent(self):
        """Cropped (matrix) and uncropped (phased) paths agree on the crop."""
        import jax.numpy as jnp

        from event_based_bos_tpu.solver.generative import patch_to_dense
        from event_based_bos_tpu.types import PatchGrid

        rng = np.random.default_rng(1)
        grid = PatchGrid((64, 96), (8, 8), (8, 8))
        field = jnp.asarray(rng.uniform(-1, 1, (3, 8, 12)), jnp.float32)
        full = patch_to_dense(field, grid)
        crop = (8, 40, 16, 80)
        cropped = patch_to_dense(field, grid, crop=crop)
        np.testing.assert_allclose(
            np.asarray(full[..., crop[0]:crop[1], crop[2]:crop[3]]),
            np.asarray(cropped), atol=1e-5)


def test_stencil_select_form_matches_nine_tap():
    """The radius-1 sign-select 4-tap path equals the generic hat-sum for
    |flow| <= 1 (incl. boundaries), on multi-channel input."""
    from event_based_bos_tpu.ops.image_warp import warp_image_stencil

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (2, 14, 18)))
    flow = jnp.asarray(rng.uniform(-1, 1, (2, 14, 18)))
    flow = flow.at[:, 0, 0].set(jnp.asarray([1.0, -1.0]))  # boundary values
    flow = flow.at[:, 3, 4].set(0.0)
    got = warp_image_stencil(img, flow, radius=1)

    # generic hat-sum (force the non-specialized branch via radius=2 with
    # the same flow — identical for |flow| <= 1)
    want = warp_image_stencil(img, flow, radius=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-7)


def test_stencil_select_extrapolation_beats_hat_fade():
    """Beyond |flow| = 1 the radius-1 select form linearly extrapolates and
    tracks the TRUE gather warp far better than the hat-sum's fade-to-zero
    (measured ~0.004 vs ~0.30 mean error at |shift| = 1.6 on smooth images).
    This is the documented out-of-envelope behavior; see warp_image_stencil.
    """
    import scipy.ndimage as ndi

    from event_based_bos_tpu.ops.image_warp import (warp_image_forward,
                                                    warp_image_stencil)

    rng = np.random.default_rng(4)
    img = jnp.asarray(ndi.gaussian_filter(rng.uniform(0, 1, (40, 50)), 2.0))
    flow = jnp.stack([jnp.full((40, 50), 1.6), jnp.full((40, 50), -0.96)])
    true = np.asarray(warp_image_forward(img, flow))
    inner = (slice(4, 36), slice(4, 46))
    e_select = np.abs(np.asarray(warp_image_stencil(img, flow, radius=1))
                      - true)[inner].mean()
    e_hat = np.abs(np.asarray(warp_image_stencil(img, flow, radius=2))
                   - true)[inner].mean()  # radius-2 hat covers 1.6 exactly
    # the radius-1 extrapolation must stay close to truth on smooth input
    assert e_select < 0.02, e_select
    # and the radius-1 HAT form (emulated via the 9-tap at radius 1 on a
    # shifted field) would fade: compare against a truncated-hat emulation
    def hat9(image, u, v):
        out = jnp.zeros_like(image)
        for orow in (-1, 0, 1):
            wr = jnp.maximum(0.0, 1.0 - jnp.abs(u + orow))
            for ocol in (-1, 0, 1):
                wc = jnp.maximum(0.0, 1.0 - jnp.abs(v + ocol))
                out = out + wr * wc * jnp.roll(image, (-orow, -ocol), (0, 1))
        return out

    e_hat1 = np.abs(np.asarray(hat9(img, flow[0], flow[1])) - true)[inner].mean()
    assert e_select < e_hat1 / 10, (e_select, e_hat1)
