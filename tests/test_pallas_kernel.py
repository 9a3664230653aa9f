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
