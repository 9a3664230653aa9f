"""Tests for the fused Pallas binned-CMax kernel (interpreter mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import event_based_bos_tpu.ops.cmax_pallas as cp
from event_based_bos_tpu.solver.cmax import CmaxSpec, binned_iwe


@pytest.fixture(autouse=True)
def interpret_mode():
    old = cp.INTERPRET
    cp.INTERPRET = True
    yield
    cp.INTERPRET = old


@pytest.mark.parametrize("radius", [1, 2])
def test_fwd_matches_jnp_reference(radius):
    rng = np.random.default_rng(0)
    B, H, W = 4, 24, 40
    hists = jnp.asarray(rng.uniform(0, 3, (B, H, W)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-radius, radius, (2, H, W)), jnp.float32)
    dts = jnp.asarray((np.arange(B) + 0.5) / B - 0.5, jnp.float32)
    got = cp.binned_warp_accumulate(hists, flow, dts, radius, 8)
    spec = CmaxSpec(image_size=(H, W), time_bins=B, warp_radius=radius,
                    iwe_sigma=0, roi=None, use_pallas=False)
    want = binned_iwe(hists, dts, flow, spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(1)
    B, H, W = 3, 16, 32
    hists = jnp.asarray(rng.uniform(0, 2, (B, H, W)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-1.2, 1.2, (2, H, W)), jnp.float32)
    dts = jnp.asarray((np.arange(B) + 0.5) / B - 0.5, jnp.float32)
    spec = CmaxSpec(image_size=(H, W), time_bins=B, warp_radius=2,
                    iwe_sigma=0, roi=None, use_pallas=False)

    g_pallas = jax.grad(
        lambda f: jnp.var(cp.binned_warp_accumulate(hists, f, dts, 2, 8)))(flow)
    g_jnp = jax.grad(lambda f: jnp.var(binned_iwe(hists, dts, f, spec)))(flow)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_jnp),
                               atol=1e-6)


def test_nonaligned_sizes():
    rng = np.random.default_rng(2)
    B, H, W = 2, 19, 37  # awkward sizes exercise the padding paths
    hists = jnp.asarray(rng.uniform(0, 1, (B, H, W)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-1, 1, (2, H, W)), jnp.float32)
    dts = jnp.asarray([-0.25, 0.25], jnp.float32)
    got = cp.binned_warp_accumulate(hists, flow, dts, 1, 8)
    assert got.shape == (H, W)
    spec = CmaxSpec(image_size=(H, W), time_bins=B, warp_radius=1,
                    iwe_sigma=0, roi=None, use_pallas=False)
    want = binned_iwe(hists, dts, flow, spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


# ---------------------------------------------------------------------------
# Hat-matmul bilinear vote kernel (ops.iwe_pallas)
# ---------------------------------------------------------------------------

import event_based_bos_tpu.ops.iwe_pallas as ipk  # noqa: E402
from event_based_bos_tpu.ops.iwe import (  # noqa: E402
    bilinear_vote, create_polarity_iwe)
from event_based_bos_tpu.solver.generative import (  # noqa: E402
    GenerativeSpec, iwe_cache)
from event_based_bos_tpu.types import events_from_arrays  # noqa: E402


@pytest.fixture(autouse=True)
def vote_interpret_mode():
    old = ipk.INTERPRET
    ipk.INTERPRET = True
    yield
    ipk.INTERPRET = old


def _rand_events(n, h, w, rng, fractional=False, spread=1.5):
    """Events with coordinates inside and (when fractional) outside bounds."""
    if fractional:
        x = rng.uniform(-spread, h - 1 + spread, n).astype(np.float32)
        y = rng.uniform(-spread, w - 1 + spread, n).astype(np.float32)
    else:
        x = rng.integers(0, h, n).astype(np.float32)
        y = rng.integers(0, w, n).astype(np.float32)
    p = rng.integers(0, 2, n).astype(np.float32)
    t = np.sort(rng.uniform(0, 1, n)).astype(np.float32)
    return events_from_arrays(x=x, y=y, t=t, p=p)


def test_vote_integer_coords_bitexact_vs_scatter():
    rng = np.random.default_rng(0)
    H, W = 24, 40
    ev = _rand_events(700, H, W, rng)
    want = np.asarray(bilinear_vote(ev, (H, W)))
    got = np.asarray(ipk.bilinear_vote_pallas(ev, (H, W), chunk=256))
    assert np.array_equal(want, got)


def test_vote_fractional_and_oob_coords():
    rng = np.random.default_rng(1)
    H, W = 24, 40
    ev = _rand_events(700, H, W, rng, fractional=True)
    want = np.asarray(bilinear_vote(ev, (H, W)))
    got = np.asarray(ipk.bilinear_vote_pallas(ev, (H, W), chunk=256))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_signed_vote_vs_scatter():
    rng = np.random.default_rng(2)
    H, W = 16, 32
    ev = _rand_events(500, H, W, rng, fractional=True)
    sign = jnp.where(ev.p > 0, 1.0, -1.0)
    want = np.asarray(bilinear_vote(ev, (H, W), weight=sign))
    got = np.asarray(ipk.signed_vote_pallas(ev, (H, W), chunk=256))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_vote_padding_and_weights():
    rng = np.random.default_rng(3)
    H, W = 16, 24
    ev = _rand_events(400, H, W, rng, fractional=True)
    wgt = jnp.asarray(rng.uniform(0.2, 2.0, ev.capacity), jnp.float32)
    want = np.asarray(bilinear_vote(ev, (H, W), weight=wgt, padding=(3, 5)))
    got = np.asarray(ipk.bilinear_vote_pallas(
        ev, (H, W), weight=wgt, padding=(3, 5), chunk=128))
    assert got.shape == (H + 6, W + 10)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_vote_ignores_masked_events():
    rng = np.random.default_rng(4)
    H, W = 16, 24
    ev = _rand_events(300, H, W, rng)
    keep = jnp.asarray(rng.integers(0, 2, ev.capacity) > 0)
    masked = ev.mask_where(keep)
    want = np.asarray(bilinear_vote(masked, (H, W)))
    got = np.asarray(ipk.bilinear_vote_pallas(masked, (H, W), chunk=128))
    assert np.array_equal(want, got)


def test_polarity_iwe_pallas_vs_xla():
    rng = np.random.default_rng(5)
    H, W = 16, 24
    ev = _rand_events(400, H, W, rng, fractional=True)
    want = np.asarray(create_polarity_iwe(ev, (H, W)))
    got = np.asarray(ipk.polarity_iwe_pallas(ev, (H, W), chunk=128))
    assert got.shape == want.shape == (2, H, W)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("no_polarity", [False, True])
def test_iwe_cache_pallas_flag_equivalent(no_polarity):
    rng = np.random.default_rng(6)
    H, W = 16, 24
    ev = _rand_events(400, H, W, rng)
    spec = GenerativeSpec(image_size=(H, W), no_polarity=no_polarity,
                          pallas_iwe=False)
    spec_p = GenerativeSpec(image_size=(H, W), no_polarity=no_polarity,
                            pallas_iwe=True)
    for a, b in zip(iwe_cache(ev, spec), iwe_cache(ev, spec_p)):
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
