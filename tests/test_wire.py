"""Tests for the quantized serving wire format (types.encode/decode_wire_events).

The serving path's dominant cost in this environment is host↔device bytes
(docs/performance.md); the wire format packs integer-coordinate event streams
into u16/i8 (+ optional i32 µs) and must decode BIT-EXACTLY to the float32
``Events`` the direct upload would have produced.
"""

import numpy as np
import jax.numpy as jnp

from event_based_bos_tpu.types import (
    Events,
    decode_wire_events,
    encode_wire_events,
    events_from_ndarray,
)

from reference_harness import synthetic_scene

H, W = 64, 96


def _batch(n=5000, frac=1.0):
    rng = np.random.default_rng(0)
    x = np.floor(rng.uniform(0, H, n) * frac) / frac
    y = np.floor(rng.uniform(0, W, n) * frac) / frac
    t = np.sort(np.rint(rng.uniform(0, 0.01, n) * 1e6)) / 1e6  # µs-aligned
    p = rng.choice([-1.0, 1.0], n)
    return np.stack([x, y, t, p], axis=1)


class TestWireRoundtrip:
    def test_integer_coords_bit_exact(self):
        arr = _batch()
        cap = 8192
        wire = encode_wire_events(arr, cap, include_t=True)
        assert wire is not None
        ev = decode_wire_events(wire)
        ref = events_from_ndarray(arr, capacity=cap)
        np.testing.assert_array_equal(np.asarray(ev.x), np.asarray(ref.x))
        np.testing.assert_array_equal(np.asarray(ev.y), np.asarray(ref.y))
        np.testing.assert_array_equal(np.asarray(ev.valid),
                                      np.asarray(ref.valid))
        # polarity round-trips bit-exactly (raw values, not sign-collapsed)
        np.testing.assert_array_equal(np.asarray(ev.p), np.asarray(ref.p))
        # timestamps decode within 2 f32 ulps of the direct upload
        np.testing.assert_allclose(np.asarray(ev.t)[:len(arr)],
                                   np.asarray(ref.t)[:len(arr)], rtol=3e-7,
                                   atol=1e-9)

    def test_subpixel_32nd_exact(self):
        arr = _batch(frac=32.0)
        wire = encode_wire_events(arr, 8192)
        assert wire is not None
        ev = decode_wire_events(wire)
        ref = events_from_ndarray(arr, capacity=8192)
        np.testing.assert_array_equal(np.asarray(ev.x), np.asarray(ref.x))

    def test_unrepresentable_falls_back(self):
        arr = _batch()
        arr[3, 0] += 0.01  # off the 1/32 grid
        assert encode_wire_events(arr, 8192) is None
        arr2 = _batch()
        arr2[0, 0] = 3000.0  # fixed-point overflow at 32×
        assert encode_wire_events(arr2, 8192) is None
        arr3 = _batch()
        arr3[5, 2] += 0.4e-6  # off the µs grid: t rides the mixed-t tier
        wire = encode_wire_events(arr3, 8192)
        assert wire is not None and "t_f32" in wire and "t_us" not in wire
        # ... and a t-less request doesn't carry time at all
        assert "t_f32" not in encode_wire_events(arr3, 8192, include_t=False)

    def test_without_t(self):
        arr = _batch()
        wire = encode_wire_events(arr, 8192, include_t=False)
        assert "t_us" not in wire
        ev = decode_wire_events(wire)
        assert np.asarray(ev.t).sum() == 0.0
        assert int(ev.count()) == len(arr)

    def test_wire_bytes(self):
        arr = _batch()
        wire = encode_wire_events(arr, 8192, include_t=False)
        nbytes = sum(np.asarray(v).nbytes for v in wire.values())
        f32 = 8192 * 17
        assert nbytes < f32 / 3, (nbytes, f32)

    def test_empty_batch(self):
        wire = encode_wire_events(np.zeros((0, 4)), 4096)
        ev = decode_wire_events(wire)
        assert int(ev.count()) == 0

    def test_zero_one_polarity_bit_exact(self):
        """CCS HDF5 streams carry p ∈ {0, 1}; the wire must reproduce the
        exact values the direct upload would hold (voxel ops read p's value,
        not just the p>0 predicate)."""
        arr = _batch()
        arr[:, 3] = (arr[:, 3] > 0).astype(np.float64)  # 0/1 stream
        wire = encode_wire_events(arr, 8192)
        assert wire is not None
        ev = decode_wire_events(wire)
        ref = events_from_ndarray(arr, capacity=8192)
        np.testing.assert_array_equal(np.asarray(ev.p), np.asarray(ref.p))

    def test_nan_falls_back(self):
        """NaN passes every range comparison (all False), so without an
        explicit finite gate the encoder would fabricate a valid event from
        an undefined NaN→uint16 cast.  It must fall back instead."""
        for col in range(4):
            arr = _batch()
            arr[7, col] = np.nan
            assert encode_wire_events(arr, 8192) is None
            assert encode_wire_events(arr, 8192, mode="round") is None
        # ... but a NaN timestamp doesn't block a t-less upload
        arr = _batch()
        arr[7, 2] = np.nan
        assert encode_wire_events(arr, 8192, include_t=False) is not None

    def test_fractional_polarity_falls_back(self):
        arr = _batch()
        arr[3, 3] = 0.5  # not representable in the i8 polarity wire
        assert encode_wire_events(arr, 8192) is None
        arr2 = _batch()
        arr2[3, 3] = 200.0  # outside int8 range
        assert encode_wire_events(arr2, 8192, mode="round") is None


class TestWireRoundMode:
    """`mode="round"` snaps off-grid batches instead of falling back —
    the compact upload for continuous-time / undistorted streams."""

    def test_continuous_t_rounds_within_half_us(self):
        arr = _batch()
        rng = np.random.default_rng(1)
        arr[:, 2] += rng.uniform(0, 1e-6, len(arr))  # off the µs grid
        # exact mode keeps the batch via the mixed-t f32 tier instead
        assert "t_f32" in encode_wire_events(arr, 8192)
        wire = encode_wire_events(arr, 8192, mode="round")
        assert wire is not None
        ev = decode_wire_events(wire)
        err = np.abs(np.asarray(ev.t, np.float64)[:len(arr)] - arr[:, 2])
        assert err.max() < 1e-6 + 1e-7, err.max()
        # integer coordinates still decode bit-exactly
        ref = events_from_ndarray(arr, capacity=8192)
        np.testing.assert_array_equal(np.asarray(ev.x), np.asarray(ref.x))

    def test_subpixel_coords_round_within_64th(self):
        rng = np.random.default_rng(2)
        arr = _batch()
        arr[:, 0] = rng.uniform(0, H - 1, len(arr))  # continuous coords
        arr[:, 1] = rng.uniform(0, W - 1, len(arr))
        assert encode_wire_events(arr, 8192) is None
        wire = encode_wire_events(arr, 8192, mode="round")
        assert wire is not None
        ev = decode_wire_events(wire)
        ex = np.abs(np.asarray(ev.x, np.float64)[:len(arr)] - arr[:, 0])
        ey = np.abs(np.asarray(ev.y, np.float64)[:len(arr)] - arr[:, 1])
        assert ex.max() <= 1 / 64 + 1e-6 and ey.max() <= 1 / 64 + 1e-6

    def test_out_of_range_still_falls_back(self):
        arr = _batch()
        arr[0, 0] = 3000.0  # 32× fixed-point overflow
        assert encode_wire_events(arr, 8192, mode="round") is None
        arr2 = _batch()
        arr2[0, 0] = -1.0
        assert encode_wire_events(arr2, 8192, mode="round") is None

    def test_unknown_mode_raises(self):
        import pytest

        with pytest.raises(ValueError):
            encode_wire_events(_batch(), 8192, mode="lossy")


def test_facade_rejects_unknown_wire_config():
    """Typos in the serving wire keys must fail loudly — a silently ignored
    `flow_fetch_dtype: fp16` would measure the uncompressed path while the
    operator believes the bytes were halved."""
    import pytest

    from event_based_bos_tpu.solver import collections

    base = {"method": "patch_eklt_pyramid2", "outer_padding": 0,
            "cost_with_weight": {"diff_norm": 1.0},
            "optimizer": {"method": "Adam", "n_iter": 4},
            "generative_ml": {"weight_loss_by_event_hist": False,
                              "weight_sigma": 5,
                              "weight_loss_by_inverse_event_hist": False,
                              "optimize_warp": False, "iwe_sigma": 2,
                              "viz_diff_scale": [-0.25, 0.25],
                              "no_polarity": False, "model_image": "current",
                              "use_log_intensity": False,
                              "poisson_model": True},
            "patch_eklt": {"patch_size": 4, "sliding_window": 2,
                           "do_event_thresholding": False, "event_thres": 8,
                           "coarsest_patch_size": 16, "finest_patch_size": 8}}
    with pytest.raises(ValueError):
        collections["patch_eklt_pyramid2"](
            (H, W), (H, W), {}, dict(base, flow_fetch_dtype="fp16"), None)
    with pytest.raises(ValueError):
        collections["patch_eklt_pyramid2"](
            (H, W), (H, W), {}, dict(base, quantized_upload="lossy"), None)


def test_flow_fetch_dtype_rejected_on_unsupporting_solver():
    """Only the pyramid facade's program casts the fetched flow; a VALID
    dtype on any other solver must be rejected, not silently ignored —
    otherwise the operator measures an uncompressed fetch while believing
    the bytes were halved."""
    import pytest

    from event_based_bos_tpu.solver import collections

    cfg = {"method": "generative_max_likelihood", "outer_padding": 0,
           "flow_fetch_dtype": "float16",
           "cost_with_weight": {"diff_norm": 1.0},
           "optimizer": {"method": "optuna", "sampler": "random", "n_iter": 4,
                         "parameters": {"v_x": {"min": -3, "max": 3},
                                        "v_y": {"min": -3, "max": 3}}},
           "generative_ml": {"weight_loss_by_event_hist": False,
                             "weight_sigma": 5,
                             "weight_loss_by_inverse_event_hist": False,
                             "optimize_warp": False, "iwe_sigma": 2,
                             "viz_diff_scale": [-0.25, 0.25],
                             "no_polarity": False, "model_image": "current",
                             "use_log_intensity": False,
                             "poisson_model": False}}
    with pytest.raises(ValueError, match="flow_fetch_dtype"):
        collections["generative_max_likelihood"]((H, W), (H, W), {}, cfg,
                                                 None)


def test_facade_round_mode_matches_f32_on_integer_coords():
    """`quantized_upload: round` on a continuous-time integer-coordinate
    stream (the synthetic loader's shape) must produce bitwise the same
    pyramid flow as the float32 upload — the solve never reads t, and the
    rounded coords are exact for integer streams."""
    from event_based_bos_tpu.solver import collections

    I1, _, events = synthetic_scene(H, W, du=(1.5, -0.8), n=20000)
    rng = np.random.default_rng(3)
    events = np.array(events)
    events[:, 2] = np.sort(rng.uniform(0.0, 0.008, len(events)))  # off-grid t
    cfg = {
        "filter": {"filters": None,
                   "parameters": {"xmin": 0, "xmax": H, "ymin": 0, "ymax": W}},
        "method": "patch_eklt_pyramid2",
        "outer_padding": 0,
        "cost_with_weight": {"diff_norm": 1.0, "image_gradient": 0.5},
        "optimizer": {"method": "Adam", "n_iter": 16},
        "generative_ml": {"weight_loss_by_event_hist": False,
                          "weight_sigma": 5,
                          "weight_loss_by_inverse_event_hist": True,
                          "optimize_warp": False, "iwe_sigma": 2,
                          "viz_diff_scale": [-0.25, 0.25],
                          "no_polarity": False, "model_image": "current",
                          "use_log_intensity": False, "poisson_model": True},
        "patch_eklt": {"patch_size": 4, "sliding_window": 2,
                       "do_event_thresholding": False, "event_thres": 8,
                       "coarsest_patch_size": 16, "finest_patch_size": 8},
    }
    base = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)
    f_ref = base.estimate(events, None, frame=I1, background=I1)

    rcfg = dict(cfg, quantized_upload="round")
    r = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, rcfg, None)
    assert r.wire_mode == "round"
    f_r = r.estimate(events, None, frame=I1, background=I1)
    np.testing.assert_array_equal(f_ref, f_r)
    assert not r._wire_fell_back


def test_preprocess_period_survives_tless_wire():
    """Regression: with `quantized_upload` and no filters, preprocess()
    must report the true window period from the host array — a t-less wire
    decode would otherwise zero it and silently break the CLI's GT/batch
    time rescaling."""
    from event_based_bos_tpu.solver import collections

    arr = _batch()
    want = float(arr[:, 2].max() - arr[:, 2].min())
    cfg = {"method": "patch_eklt_pyramid2", "outer_padding": 0,
           "quantized_upload": True,
           "cost_with_weight": {"diff_norm": 1.0},
           "optimizer": {"method": "Adam", "n_iter": 8},
           "generative_ml": {"weight_loss_by_event_hist": False,
                             "weight_sigma": 5,
                             "weight_loss_by_inverse_event_hist": False,
                             "optimize_warp": False, "iwe_sigma": 2,
                             "viz_diff_scale": [-0.25, 0.25],
                             "no_polarity": False, "model_image": "current",
                             "use_log_intensity": False,
                             "poisson_model": True},
           "patch_eklt": {"patch_size": 4, "sliding_window": 2,
                          "do_event_thresholding": False, "event_thres": 8,
                          "coarsest_patch_size": 16, "finest_patch_size": 8}}
    solv = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)
    _ev, period = solv.preprocess(arr)
    assert abs(period - want) < 1e-9, (period, want)


def test_pyramid_facade_quantized_matches_f32():
    """`quantized_upload: true` on the pyramid facade produces bitwise the
    same flow as the float32 upload (integer-coordinate stream)."""
    from event_based_bos_tpu.solver import collections

    I1, _, events = synthetic_scene(H, W, du=(1.5, -0.8), n=20000)
    cfg = {
        "filter": {"filters": None,
                   "parameters": {"xmin": 0, "xmax": H, "ymin": 0, "ymax": W}},
        "method": "patch_eklt_pyramid2",
        "outer_padding": 0,
        "cost_with_weight": {"diff_norm": 1.0, "image_gradient": 0.5,
                             "flow_norm_pxy": 0.1},
        "optimizer": {"method": "Adam", "n_iter": 24},
        "generative_ml": {"weight_loss_by_event_hist": False,
                          "weight_sigma": 5,
                          "weight_loss_by_inverse_event_hist": True,
                          "optimize_warp": True, "iwe_sigma": 2,
                          "viz_diff_scale": [-0.25, 0.25],
                          "no_polarity": False, "model_image": "current",
                          "use_log_intensity": False, "poisson_model": True},
        "patch_eklt": {"patch_size": 4, "sliding_window": 2,
                       "do_event_thresholding": False, "event_thres": 8,
                       "coarsest_patch_size": 16, "finest_patch_size": 8},
    }
    base = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)
    f_ref = base.estimate(events, None, frame=I1, background=I1)

    qcfg = dict(cfg, quantized_upload=True)
    q = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, qcfg, None)
    assert q.wire_quantized
    f_q = q.estimate(events, None, frame=I1, background=I1)
    np.testing.assert_array_equal(f_ref, f_q)


def test_pyramid_facade_f16_fetch_close():
    """`flow_fetch_dtype: float16` halves the fetched bytes; values agree
    with f32 to half-precision rounding."""
    from event_based_bos_tpu.solver import collections

    I1, _, events = synthetic_scene(H, W, du=(1.5, -0.8), n=20000)
    import copy

    cfg = {
        "filter": {"filters": None,
                   "parameters": {"xmin": 0, "xmax": H, "ymin": 0, "ymax": W}},
        "method": "patch_eklt_pyramid2",
        "outer_padding": 0,
        "cost_with_weight": {"diff_norm": 1.0},
        "optimizer": {"method": "Adam", "n_iter": 24},
        "generative_ml": {"weight_loss_by_event_hist": False,
                          "weight_sigma": 5,
                          "weight_loss_by_inverse_event_hist": False,
                          "optimize_warp": False, "iwe_sigma": 2,
                          "viz_diff_scale": [-0.25, 0.25],
                          "no_polarity": False, "model_image": "current",
                          "use_log_intensity": False, "poisson_model": True},
        "patch_eklt": {"patch_size": 4, "sliding_window": 2,
                       "do_event_thresholding": False, "event_thres": 8,
                       "coarsest_patch_size": 16, "finest_patch_size": 8},
    }
    base = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)
    f_ref = base.estimate(events, None, frame=I1, background=I1)
    hcfg = copy.deepcopy(cfg)
    hcfg["flow_fetch_dtype"] = "float16"
    h = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, hcfg, None)
    f_h = h.estimate(events, None, frame=I1, background=I1)
    assert f_h.dtype == np.float32
    scale = np.maximum(np.abs(f_ref), 1e-3)
    assert (np.abs(f_h - f_ref) / scale).max() < 1.5e-3


class TestWireExactIsRoundTrip:
    """``mode="exact"`` accepts a batch iff the decode reproduces the direct
    float32 upload bitwise (coords/p; t on the µs grid) — regression tests
    for the old absolute tolerances, which silently quantized values a few
    f32 ulps off the grid instead of falling back."""

    def test_coord_one_ulp_off_grid_falls_back(self):
        arr = _batch()
        # 1 f32 ulp above 100.0: |x·32 − rint(x·32)| ≈ 2.4e-4, inside the old
        # 1e-3 tolerance but NOT equal to 100.0 after the wire round-trip
        arr[7, 0] = float(np.nextafter(np.float32(100.0), np.float32(200.0)))
        assert encode_wire_events(arr, 8192) is None
        # snapping is exactly what 'round' mode is for
        assert encode_wire_events(arr, 8192, mode="round") is not None

    def test_time_just_off_grid_takes_mixed_tier(self):
        arr = _batch()
        arr[5, 2] += 1e-3 * 1e-6  # 1e-3 µs off grid (inside the old 1e-2 tol)
        wire = encode_wire_events(arr, 8192)
        # the µs wire would silently round this; the mixed-t tier ships the
        # raw f32 timestamps instead — bitwise equal to the direct upload
        assert wire is not None and "t_f32" in wire
        ev = decode_wire_events(wire)
        ref = events_from_ndarray(arr, capacity=8192)
        np.testing.assert_array_equal(np.asarray(ev.t), np.asarray(ref.t))
        assert "t_us" in encode_wire_events(arr, 8192, mode="round")

    def test_near_integer_polarity_falls_back(self):
        arr = _batch()
        arr[2, 3] = 1.0001  # inside the old 1e-3 tolerance… barely not
        arr[3, 3] = 1.0009
        assert encode_wire_events(arr, 8192) is None
        assert encode_wire_events(arr, 8192, mode="round") is not None


class TestMixedTTier:
    """round-5: ``mode="exact"`` ships raw f32 timestamps when the stream is
    off the µs grid (same 4 B/event), decoding bitwise-identically to the
    direct float32 upload on every field — the tier that lets the exact wire
    run as the DEFAULT upload."""

    def test_huge_window_takes_mixed_tier(self):
        arr = _batch()
        arr[-1, 2] += 4000.0  # window ≥ 2^31 µs: i32-µs wire can't carry it
        wire = encode_wire_events(arr, 8192)
        assert wire is not None and "t_f32" in wire
        ev = decode_wire_events(wire)
        ref = events_from_ndarray(arr, capacity=8192)
        np.testing.assert_array_equal(np.asarray(ev.t), np.asarray(ref.t))
        # round mode has no f32 tier — it must still fall back
        assert encode_wire_events(arr, 8192, mode="round") is None

    def test_on_grid_stream_keeps_us_wire(self):
        # µs-aligned batches still take the (more compact under gzip,
        # contract-unchanged) i32 tier — the mixed tier is a fallback only
        assert "t_us" in encode_wire_events(_batch(), 8192)

    def test_mixed_tier_full_field_bitwise(self):
        rng = np.random.default_rng(7)
        arr = _batch()
        arr[:, 2] = np.sort(rng.uniform(0.0, 0.008, len(arr)))  # continuous
        wire = encode_wire_events(arr, 8192)
        assert "t_f32" in wire
        ev = decode_wire_events(wire)
        ref = events_from_ndarray(arr, capacity=8192)
        for a, b in ((ev.x, ref.x), (ev.y, ref.y), (ev.t, ref.t),
                     (ev.p, ref.p), (ev.valid, ref.valid)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestOpportunisticDefaultWire:
    """round-5: with no ``quantized_upload`` key the facade tries the exact
    wire on every upload — bitwise-identical Events at ~2× fewer bytes —
    and ``quantized_upload: direct`` opts out."""

    CFG = {"method": "patch_eklt_pyramid2", "outer_padding": 0,
           "cost_with_weight": {"diff_norm": 1.0, "image_gradient": 0.5},
           "optimizer": {"method": "Adam", "n_iter": 16},
           "generative_ml": {"weight_loss_by_event_hist": False,
                             "weight_sigma": 5,
                             "weight_loss_by_inverse_event_hist": True,
                             "optimize_warp": False, "iwe_sigma": 2,
                             "viz_diff_scale": [-0.25, 0.25],
                             "no_polarity": False, "model_image": "current",
                             "use_log_intensity": False,
                             "poisson_model": True},
           "patch_eklt": {"patch_size": 4, "sliding_window": 2,
                          "do_event_thresholding": False, "event_thres": 8,
                          "coarsest_patch_size": 16, "finest_patch_size": 8}}

    def _solver(self, extra=None):
        from event_based_bos_tpu.solver import collections

        cfg = dict(self.CFG, **(extra or {}))
        return collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg,
                                                  None)

    def test_default_upload_rides_the_wire(self, monkeypatch):
        import event_based_bos_tpu.types as types_mod
        from event_based_bos_tpu.solver import wire as wire_mod

        calls = []
        real = types_mod.encode_wire_events

        def spy(events, capacity, include_t=True, mode="exact",
                t_bitwise=False):
            calls.append((mode, t_bitwise))
            return real(events, capacity, include_t=include_t, mode=mode,
                        t_bitwise=t_bitwise)

        # wire.py imports inside the method body, so patch the source module
        monkeypatch.setattr(types_mod, "encode_wire_events", spy)
        solv = self._solver()
        assert solv._wire_opportunistic and not solv.wire_quantized
        ev = solv._to_events(_batch())
        # the default path must request the bitwise-t tier: the i32-µs
        # decode is ~2 ulps off and pads invalid slots with t0, not 0
        assert calls == [("exact", True)]
        ref = events_from_ndarray(_batch(), capacity=8192)
        for a, b in ((ev.x, ref.x), (ev.y, ref.y), (ev.t, ref.t),
                     (ev.p, ref.p), (ev.valid, ref.valid)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_direct_opts_out(self, monkeypatch):
        import event_based_bos_tpu.types as types_mod

        def boom(*a, **k):  # pragma: no cover - assertion helper
            raise AssertionError("wire encode must not run under 'direct'")

        monkeypatch.setattr(types_mod, "encode_wire_events", boom)
        solv = self._solver({"quantized_upload": "direct"})
        assert not solv._wire_opportunistic
        solv._to_events(_batch())

    def test_unrepresentable_batch_uploads_directly_without_warning(
            self, caplog):
        import logging

        solv = self._solver()
        arr = _batch()
        arr[3, 0] += 0.01  # off the 1/32 grid → encoder refuses
        with caplog.at_level(logging.WARNING):
            ev = solv._to_events(arr)
        assert not solv._wire_fell_back
        assert not any("quantized_upload" in r.message for r in caplog.records)
        ref = events_from_ndarray(arr, capacity=8192)
        np.testing.assert_array_equal(np.asarray(ev.x), np.asarray(ref.x))

    def test_default_flow_bitwise_vs_direct(self):
        rng = np.random.default_rng(5)
        I1, _, events = synthetic_scene(H, W, du=(1.5, -0.8), n=20000)
        events = np.array(events)
        events[:, 2] = np.sort(rng.uniform(0.0, 0.008, len(events)))
        cfg = dict(self.CFG,
                   filter={"filters": None,
                           "parameters": {"xmin": 0, "xmax": H,
                                          "ymin": 0, "ymax": W}})
        from event_based_bos_tpu.solver import collections

        opp = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg,
                                                 None)
        f_opp = opp.estimate(events, None, frame=I1, background=I1)
        direct = collections["patch_eklt_pyramid2"](
            (H, W), (H, W), {}, dict(cfg, quantized_upload="direct"), None)
        f_dir = direct.estimate(events, None, frame=I1, background=I1)
        np.testing.assert_array_equal(f_opp, f_dir)


def test_exact_wire_disabled_under_precision_64():
    """precision: "64" events carry precision the f32-grid wire cannot; the
    exact mode's contract is bitwise equality, so the facade must use direct
    float64 uploads instead (the 'round' mode keeps the compact wire — its
    contract is documented snapping, not bitwise equality)."""
    from event_based_bos_tpu.solver import collections

    cfg = {"method": "patch_eklt_pyramid2", "outer_padding": 0,
           "quantized_upload": True, "precision": "64",
           "cost_with_weight": {"diff_norm": 1.0},
           "optimizer": {"method": "Adam", "n_iter": 8},
           "generative_ml": {"weight_loss_by_event_hist": False,
                             "weight_sigma": 5,
                             "weight_loss_by_inverse_event_hist": False,
                             "optimize_warp": False, "iwe_sigma": 2,
                             "viz_diff_scale": [-0.25, 0.25],
                             "no_polarity": False, "model_image": "current",
                             "use_log_intensity": False,
                             "poisson_model": True},
           "patch_eklt": {"patch_size": 4, "sliding_window": 2,
                          "do_event_thresholding": False, "event_thres": 8,
                          "coarsest_patch_size": 16, "finest_patch_size": 8}}
    solv = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, cfg, None)
    ev = solv._to_events(_batch())
    assert np.asarray(ev.x).dtype == np.float64
    assert solv._wire_fell_back  # warned once, then direct uploads

    rcfg = dict(cfg, quantized_upload="round")
    r = collections["patch_eklt_pyramid2"]((H, W), (H, W), {}, rcfg, None)
    ev_r = r._to_events(_batch())
    assert not r._wire_fell_back
    assert np.asarray(ev_r.x).dtype == np.float64  # decoded at solver dtype
