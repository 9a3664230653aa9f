"""Tests for the event-stream noise filters (JAX and pipeline)."""

import numpy as np
import pytest
import jax.numpy as jnp

from event_based_bos_tpu import events_from_ndarray
from event_based_bos_tpu.ops.filters import (
    EventFilter,
    background_activity_filter,
    background_activity_filter_fast,
    flicker_filter,
    hot_pixel_filter,
)
from event_based_bos_tpu import runtime


def make_noise_and_signal(seed=0):
    """Isolated noise events + a dense supported cluster."""
    rng = np.random.default_rng(seed)
    h, w = 32, 40
    # noise: single events at random isolated pixels, spread over 1 s
    noise = np.stack([
        rng.integers(0, h, 60), rng.integers(0, w, 60),
        np.sort(rng.uniform(0, 1.0, 60)), rng.integers(0, 2, 60),
    ], 1).astype(float)
    # signal: a burst at neighbouring pixels within 1 ms
    t0 = 0.5
    sig = np.stack([
        np.full(40, 16.0) + rng.integers(-1, 2, 40),
        np.full(40, 20.0) + rng.integers(-1, 2, 40),
        np.sort(t0 + rng.uniform(0, 0.001, 40)),
        rng.integers(0, 2, 40),
    ], 1).astype(float)
    ev = np.concatenate([noise, sig])
    ev = ev[np.argsort(ev[:, 2], kind="stable")]
    is_signal = ev[:, 2] >= t0
    is_signal &= ev[:, 2] <= t0 + 0.001
    return ev, is_signal, (h, w)


class TestBAF:
    def test_exact_jax_matches_native(self):
        ev, _, shape = make_noise_and_signal()
        e = events_from_ndarray(ev, dtype=jnp.float64)
        got, _tm = background_activity_filter(e, shape, dt=0.004)
        keep_native, _ = runtime.baf_filter(ev, shape, 0.004)
        np.testing.assert_array_equal(np.asarray(got.valid), keep_native)

    def test_keeps_signal_drops_noise(self):
        ev, is_signal, shape = make_noise_and_signal()
        e = events_from_ndarray(ev, dtype=jnp.float64)
        got, _ = background_activity_filter(e, shape, dt=0.004)
        keep = np.asarray(got.valid)
        assert keep[is_signal].mean() > 0.8
        assert keep[~is_signal].mean() < 0.3

    def test_exact_matches_native_on_dense_bos_stream(self):
        """Bit-for-bit vs the C++ exact filter on a realistic dense stream,
        including truncated border windows and padded capacity."""
        from reference_harness import synthetic_scene

        H, W = 48, 64
        _I1, _I2, events = synthetic_scene(H, W, du=(1.5, -0.8), n=40000)
        for dt in (0.0002, 0.0005, 0.002):
            e = events_from_ndarray(events, dtype=jnp.float64)
            got, _ = background_activity_filter(e, (H, W), dt=dt)
            keep_native, _ = runtime.baf_filter(events, (H, W), dt)
            np.testing.assert_array_equal(np.asarray(got.valid), keep_native)
        # padded capacity + larger window + higher support
        e2 = events_from_ndarray(events, capacity=65536, dtype=jnp.float64)
        got2, _ = background_activity_filter(e2, (H, W), dt=0.0005, ksize=2,
                                             num_support_event=2)
        keep2, _ = runtime.baf_filter(events, (H, W), 0.0005, 2, 2)
        keep_dev = np.asarray(got2.valid)
        np.testing.assert_array_equal(keep_dev[:len(events)], keep2)
        assert not keep_dev[len(events):].any()

    def test_fast_divergence_bounded_on_dense_stream(self):
        """The opt-in binned kernel's keep-decision disagreement vs exact is
        bounded on a dense synthetic-BOS stream (measured 0.932 / 0.993)."""
        from reference_harness import synthetic_scene

        H, W = 48, 64
        _I1, _I2, events = synthetic_scene(H, W, du=(1.5, -0.8), n=40000)
        e = events_from_ndarray(events, dtype=jnp.float64)
        for dt, bound in ((0.0002, 0.92), (0.0005, 0.98)):
            exact, _ = background_activity_filter(e, (H, W), dt=dt)
            fast = background_activity_filter_fast(e, (H, W), dt=dt,
                                                   max_bins=64)
            agree = (np.asarray(exact.valid) == np.asarray(fast.valid)).mean()
            assert agree >= bound, (dt, agree)

    def test_event_filter_defaults_to_exact_baf(self):
        cfg = {"filters": ["BAF"],
               "parameters": {"BAF_dt": 0.004, "BAF_ksize": 1,
                              "BAF_num_support_event": 1}}
        assert EventFilter((32, 40), cfg).exact_baf
        cfg_fast = {"filters": ["BAF"],
                    "parameters": {"BAF_dt": 0.004, "BAF_fast": True}}
        assert not EventFilter((32, 40), cfg_fast).exact_baf

    def test_fast_binned_close_to_exact(self):
        ev, _, shape = make_noise_and_signal(1)
        e = events_from_ndarray(ev, dtype=jnp.float64)
        exact, _ = background_activity_filter(e, shape, dt=0.004)
        fast = background_activity_filter_fast(e, shape, dt=0.004,
                                               max_bins=512)
        agree = (np.asarray(exact.valid) == np.asarray(fast.valid)).mean()
        assert agree > 0.85, agree


class TestHotAndFlicker:
    def test_hot_pixel(self):
        rng = np.random.default_rng(0)
        normal = np.stack([rng.integers(0, 16, 100), rng.integers(0, 16, 100),
                           np.sort(rng.uniform(0, 1, 100)),
                           np.ones(100)], 1).astype(float)
        hot = np.stack([np.full(50, 3.0), np.full(50, 4.0),
                        np.sort(rng.uniform(0, 1, 50)), np.ones(50)],
                       1).astype(float)
        ev = events_from_ndarray(np.concatenate([normal, hot]),
                                 dtype=jnp.float64)
        out = hot_pixel_filter(ev, (16, 16), hot_pixel=20)
        keep = np.asarray(out.valid)
        assert not keep[100:].any()          # hot pixel removed
        assert keep[:100].mean() > 0.8       # most normals kept

    def test_flicker_links_polarity_flips(self):
        ev = np.array([
            [2, 2, 0.000, 1], [2, 2, 0.003, -1],   # linked pair (flip < dt)
            [5, 5, 0.000, 1], [5, 5, 0.200, -1],   # too far apart
            [7, 7, 0.050, 1],                      # isolated
        ], float)
        e = events_from_ndarray(ev, dtype=jnp.float64)
        linked, unlinked = flicker_filter(e, dt=0.01)
        np.testing.assert_array_equal(np.asarray(linked.valid),
                                      [True, True, False, False, False])
        assert int(unlinked.count()) == 3


class TestEventFilterPipeline:
    def test_crop_prepended_and_pipeline(self):
        ev, _, shape = make_noise_and_signal()
        cfg = {"filters": ["BAF", "HOT"],
               "parameters": {"xmin": 0, "xmax": 32, "ymin": 0, "ymax": 40,
                              "BAF_dt": 0.004, "BAF_ksize": 1,
                              "BAF_num_support_event": 1,
                              "BAF_continuous_update": False,
                              "HOT_thresh": 30}}
        f = EventFilter(shape, cfg)
        assert f.filters[0] == "CROP"
        e = events_from_ndarray(ev, dtype=jnp.float64)
        out = f.process(e)
        assert int(out.count()) < len(ev)

    def test_numpy_pipeline_matches_device_exact(self):
        ev, _, shape = make_noise_and_signal(2)
        cfg = {"filters": ["BAF"],
               "parameters": {"xmin": 0, "xmax": 32, "ymin": 0, "ymax": 40,
                              "BAF_dt": 0.004, "BAF_ksize": 1,
                              "BAF_num_support_event": 1,
                              "BAF_continuous_update": False}}
        f_np = EventFilter(shape, cfg)
        filtered_np = f_np.process_numpy(ev)
        f_dev = EventFilter(shape, cfg, exact_baf=True)
        e = events_from_ndarray(ev, dtype=jnp.float64)
        filtered_dev = f_dev.process(e)
        np.testing.assert_allclose(filtered_np,
                                   filtered_dev.to_numpy(), atol=1e-12)
