"""Multi-device sharding tests (8 virtual CPU devices via conftest)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from event_based_bos_tpu import events_from_ndarray
from event_based_bos_tpu.parallel import make_mesh, sharded_polarity_votes
from event_based_bos_tpu.solver import GenerativeSpec
from event_based_bos_tpu.solver.generative import polarity_votes
from event_based_bos_tpu.types import Events

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


def _batched_events(batch, capacity, h, w, seed=0):
    rng = np.random.default_rng(seed)
    evs = []
    for _ in range(batch):
        arr = np.stack([
            rng.uniform(0, h - 1, capacity),
            rng.uniform(0, w - 1, capacity),
            np.sort(rng.uniform(0, 0.01, capacity)),
            rng.integers(0, 2, capacity) * 2.0 - 1.0,
        ], 1)
        evs.append(events_from_ndarray(arr, capacity=capacity))
    return Events(*(jnp.stack([getattr(e, f) for e in evs])
                    for f in Events._fields))


def test_sharded_votes_match_single_device():
    h, w = 24, 32
    spec = GenerativeSpec(image_size=(h, w))
    ev = _batched_events(4, 1024, h, w)
    mesh = make_mesh((2, 4), ("data", "event"))
    got = sharded_polarity_votes(ev, spec, mesh)
    want = jax.vmap(lambda e: polarity_votes(e, spec))(ev)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_dryrun_multichip_entrypoint():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_hyperparam_sweep_sharded():
    from event_based_bos_tpu.parallel import hyperparam_sweep, make_mesh
    from event_based_bos_tpu.solver import GenerativeSpec, PyramidSpec
    from event_based_bos_tpu.solver.pyramid import roi_mask

    h, w = 32, 48
    gen = GenerativeSpec(image_size=(h, w), iwe_sigma=2.0,
                         weight_by_inverse_event_hist=False,
                         optimize_warp=True, poisson_model=True)
    spec = PyramidSpec(gen=gen, roi=(0, h, 0, w), coarsest_patch=16,
                       finest_patch=8, n_iter=8)
    rng = np.random.default_rng(0)
    evn = np.stack([rng.uniform(0, h - 1, 2048), rng.uniform(0, w - 1, 2048),
                    np.sort(rng.uniform(0, 0.01, 2048)),
                    rng.integers(0, 2, 2048) * 2.0 - 1.0], 1)
    ev = events_from_ndarray(evn, capacity=2048)
    frame = jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)
    mask = jnp.asarray(roi_mask(spec))
    mesh = make_mesh((8,), ("data",))
    lrs = jnp.asarray([0.01, 0.02, 0.05, 0.1, 0.2, 0.3, 0.4, 0.5])
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    flows, losses = hyperparam_sweep(ev, frame, mask, lrs, keys, spec, mesh)
    assert flows.shape == (8, 2, h, w)
    assert np.isfinite(np.asarray(flows)).all()
    assert np.isfinite(np.asarray(losses)).all()
    # different lrs must give different results
    assert float(jnp.abs(flows[0] - flows[-1]).max()) > 0
