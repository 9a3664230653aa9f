"""Tests for the visualizer, checkpoint store, tracing, misc utils."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from event_based_bos_tpu.utils.checkpoint import FrameResultStore
from event_based_bos_tpu.utils.misc import check_key_and_bool, read_flow_error_text
from event_based_bos_tpu.utils.tracing import Timer, timeit
from event_based_bos_tpu.visualizer import Visualizer


@pytest.fixture()
def viz(tmp_path):
    return Visualizer((24, 32), save=True, show=False, save_dir=str(tmp_path))


class TestVisualizer:
    def test_prefix_counters(self, viz, tmp_path):
        img = np.zeros((24, 32), np.uint8)
        viz.visualize_image(img, "foo")
        viz.visualize_image(img, "foo")
        viz.visualize_image(img)
        assert (tmp_path / "foo0.png").exists()
        assert (tmp_path / "foo1.png").exists()
        assert (tmp_path / "image0.png").exists()
        viz.reset_save_count("foo")
        viz.visualize_image(img, "foo")
        assert (tmp_path / "foo0.png").exists()

    def test_flow_visualization_and_npy(self, viz, tmp_path):
        rng = np.random.default_rng(0)
        fx = rng.normal(size=(24, 32))
        fy = rng.normal(size=(24, 32))
        viz.visualize_optical_flow(fx, fy, visualize_color_wheel=True,
                                   file_prefix="flow", save_flow=True)
        assert (tmp_path / "flow0.png").exists()
        assert (tmp_path / "flow0.npy").exists()
        assert (tmp_path / "color_wheel.png").exists()
        arr = np.load(tmp_path / "flow0.npy")
        np.testing.assert_allclose(arr, np.stack([fx, fy]))

    def test_color_optical_flow_properties(self, viz):
        fx = np.ones((24, 32))
        fy = np.zeros((24, 32))
        rgb, wheel, maxmag = viz.color_optical_flow(fx, fy, ord=0.5)
        assert rgb.shape == (24, 32, 3) and rgb.dtype == np.uint8
        assert wheel.shape == (24, 24, 3)
        assert abs(maxmag - 1.0) < 1e-6
        # uniform flow → uniform color
        assert (rgb == rgb[0, 0]).all()

    def test_event_and_masked_views(self, viz, tmp_path):
        rng = np.random.default_rng(0)
        events = np.stack([rng.integers(0, 24, 200), rng.integers(0, 32, 200),
                           np.sort(rng.uniform(0, 1, 200)),
                           rng.integers(0, 2, 200)], 1).astype(float)
        viz.visualize_event(events, file_prefix="ev")
        assert (tmp_path / "ev0.png").exists()
        flow = rng.normal(size=(2, 24, 32))
        viz.visualize_optical_flow_on_event_mask(flow, events,
                                                 file_prefix="masked",
                                                 mask_morph=True)
        assert (tmp_path / "masked0.png").exists()
        viz.visualize_overlay_optical_flow_on_event(flow, events,
                                                    file_prefix="ovl")
        viz.visualize_poisson_integration(flow, file_prefix="poisson")
        assert (tmp_path / "poisson0.png").exists()
        viz.visualize_optical_flow_pred_and_gt(flow, flow,
                                               pred_file_prefix="p",
                                               gt_file_prefix="g")
        assert (tmp_path / "p0.png").exists() and (tmp_path / "g0.png").exists()

    def test_video_assembly(self, viz, tmp_path):
        img = np.zeros((24, 32), np.uint8)
        for i in range(4):
            viz.visualize_image(img + 40 * i, "seq")
        out = viz.visualize_sequential_images_as_video("seq")
        if out is None:
            pytest.skip("no mp4 codec")
        assert os.path.exists(out)

    def test_history_plots(self, viz, tmp_path):
        viz.visualize_scipy_history({"loss": np.linspace(1, 0, 50),
                                     "diff_norm": np.linspace(2, 1, 50)})
        assert (tmp_path / "optimization_steps0.png").exists()
        viz.visualize_optuna_history(np.random.rand(30))
        assert (tmp_path / "sampler_history0.png").exists()

    def test_save_array(self, viz, tmp_path):
        viz.save_array(np.arange(6.0), file_prefix="arr", new_prefix=True)
        assert (tmp_path / "arr0.npy").exists()


class TestCheckpoint:
    def test_record_resume_summary(self, tmp_path):
        store = FrameResultStore(str(tmp_path))
        store.record(0, flow=np.ones((2, 4, 5)), EPE=0.5, t1=0.0, t2=0.1)
        store.record(1, flow=2 * np.ones((2, 4, 5)), EPE=0.7, t1=0.1, t2=0.2)
        # new instance resumes from the manifest
        store2 = FrameResultStore(str(tmp_path))
        assert 0 in store2 and 1 in store2 and 2 not in store2
        np.testing.assert_allclose(store2.load_flow(1), 2.0)
        s = store2.summary()
        np.testing.assert_allclose(s["EPE"]["mean"], 0.6)
        assert s["EPE"]["n_data"] == 2

    def test_corrupt_manifest_recovers(self, tmp_path):
        (tmp_path / FrameResultStore.MANIFEST).write_text("{not json")
        store = FrameResultStore(str(tmp_path))
        assert len(store) == 0


class TestMiscAndTracing:
    def test_check_key_and_bool(self):
        assert check_key_and_bool({"a": True}, "a")
        assert not check_key_and_bool({"a": False}, "a")
        assert not check_key_and_bool({}, "a")

    def test_read_flow_error_text(self, tmp_path):
        p = tmp_path / "err.txt"
        p.write_text(
            "frame 0::{'EPE': 1.0, '1PE': 0.5, 'AE': 0.1, 'FWL': 2.0}\n"
            "frame 1::{'EPE': 3.0, '1PE': 0.25, 'AE': 0.0, 'FWL': 0.5}\n")
        per, stats = read_flow_error_text(str(p))
        np.testing.assert_allclose(per["EPE"], [1.0, 3.0])
        np.testing.assert_allclose(per["1PE"], [50.0, 25.0])  # → %
        np.testing.assert_allclose(per["FWL"], [0.5, 2.0])    # inverted
        assert stats["AE"]["n_data"] == 1  # zeros excluded for AE
        np.testing.assert_allclose(stats["EPE"]["rms"], np.sqrt(5.0))

    def test_timer_and_timeit(self):
        t = Timer()
        with t.section("a"):
            pass
        assert "a" in t.report()
        stats = timeit(lambda x: x * 2, jnp.ones((8, 8)), repeats=2)
        assert stats["n"] == 2 and np.isfinite(stats["median_s"])


class TestJittedRenderParity:
    """The per-frame render/eval programs were moved on-device (uint8 out);
    they must stay bit-identical to the host formulas they replaced."""

    def test_clipped_iwe_matches_host_formula(self):
        import jax.numpy as jnp

        from event_based_bos_tpu import events_from_ndarray
        from event_based_bos_tpu.ops.iwe import create_image_from_events
        from event_based_bos_tpu.solver.api import _jit_clipped_iwe

        rng = np.random.default_rng(0)
        n, h, w = 4000, 48, 64
        arr = np.stack([rng.uniform(0, h, n), rng.uniform(0, w, n),
                        np.sort(rng.uniform(0, 1, n)),
                        rng.integers(0, 2, n).astype(float)], 1)
        ev = events_from_ndarray(arr, capacity=4096)
        for max_scale in (7, 50):
            got = np.asarray(_jit_clipped_iwe((h, w))(
                ev, jnp.asarray(float(max_scale), jnp.float32)))
            im = np.asarray(create_image_from_events(ev, (h, w), sigma=0))
            want = 255 - np.clip(max_scale * im, 0, 255).astype(np.uint8)
            np.testing.assert_array_equal(got, want)

    def test_poisson_view_matches_host_formula(self):
        import jax.numpy as jnp

        from event_based_bos_tpu.ops.image_warp import standardize_image_center
        from event_based_bos_tpu.ops.poisson import poisson_reconstruct
        from event_based_bos_tpu.visualizer import _poisson_view

        rng = np.random.default_rng(1)
        flow = rng.standard_normal((2, 32, 40)).astype(np.float32)
        got = np.asarray(_poisson_view(flow[1], flow[0]))
        p = poisson_reconstruct(jnp.asarray(flow[1]), jnp.asarray(flow[0]),
                                jnp.zeros(flow[0].shape, jnp.float32))
        want = np.asarray(standardize_image_center(np.asarray(p))).astype(
            np.uint8)
        np.testing.assert_array_equal(got, want)


def test_vector_field_view(tmp_path):
    viz = Visualizer((24, 32), save=True, show=False, save_dir=str(tmp_path))
    flow = np.random.default_rng(0).normal(size=(2, 24, 32))
    viz.visualize_vector_field(flow, step=8)
    assert (tmp_path / "vector_field0.png").exists()


def test_visualize_event_empty_window(tmp_path):
    """Empty event windows render a background frame instead of crashing."""
    viz = Visualizer((24, 32), save=True, show=False, save_dir=str(tmp_path))
    viz.visualize_event(np.zeros((0, 4)), file_prefix="empty")
    assert (tmp_path / "empty0.png").exists()
    viz.visualize_event(np.zeros((0, 4)), grayscale=False, file_prefix="emptyc")
    assert (tmp_path / "emptyc0.png").exists()


def test_frame_index_pinning(tmp_path):
    """set_frame_index pins prefixed artifact names to an explicit frame
    number (finalize order != time order in sequential mesh mode; resumed
    runs skip frames)."""
    from event_based_bos_tpu.visualizer import Visualizer

    viz = Visualizer((8, 8), show=False, save=True, save_dir=str(tmp_path))
    viz.set_frame_index(7)
    assert viz.get_filename_from_prefix("pred_flow").endswith("pred_flow7.png")
    viz.set_frame_index(2)
    assert viz.get_filename_from_prefix("pred_flow").endswith("pred_flow2.png")
    viz.set_frame_index(None)  # back to call-order counting
    assert viz.get_filename_from_prefix("pred_flow").endswith("pred_flow3.png")


class TestPolarColorization:
    """Device-rendered polar planes vs the host float64 colorization
    (round 4: the per-frame flow colorization moved into the render
    bundle; the planes are f32 math + an f16 magnitude plane, so uint8
    quantization boundaries may land one LSB apart — the images must be
    visually identical)."""

    @staticmethod
    def _polar(flow):
        # mirrors solver.api._jit_render_bundle's device math on numpy
        fx = np.nan_to_num(flow[0].astype(np.float32), nan=0.0,
                           posinf=0.0, neginf=0.0)
        fy = np.nan_to_num(flow[1].astype(np.float32), nan=0.0,
                           posinf=0.0, neginf=0.0)
        magp = np.sqrt(np.sqrt(fx * fx + fy * fy))
        ang = ((np.arctan2(fy, fx) + np.pi) * (180.0 / np.pi) / 2.0)
        return ang.astype(np.uint8), magp.astype(np.float16)

    def _assert_close(self, a, b):
        diff = np.abs(a.astype(int) - b.astype(int))
        # hue truncation one LSB apart shifts RGB by up to ~9 at sector
        # boundaries; such pixels must be rare, everything else <= 1 LSB
        assert (diff > 1).mean() < 0.01, (diff > 1).mean()
        # +-1-LSB value-plane truncation differences are common (~25% of
        # pixels); anything larger is confined to hue-sector boundaries
        assert diff.mean() < 0.5

    def test_polar_matches_host_colorization(self, viz):
        rng = np.random.default_rng(0)
        flow = rng.uniform(-3, 3, (2, 24, 32))
        flow[0, 0, 0] = np.nan
        flow[1, 2, 3] = np.inf
        host, _, mx_h = viz.color_optical_flow(flow[0], flow[1], ord=0.5)
        rgb, mx_p = viz.color_optical_flow_from_polar(*self._polar(flow))
        self._assert_close(host, rgb)
        assert abs(mx_h - mx_p) / mx_h < 1e-3

    def test_polar_masked_view_matches(self, viz, tmp_path):
        rng = np.random.default_rng(1)
        flow = rng.uniform(-2, 2, (2, 24, 32))
        mask = rng.uniform(0, 1, (1, 24, 32)) > 0.4
        import cv2
        viz.visualize_optical_flow_on_event_mask(
            flow, None, file_prefix="m_host", mask_color="black",
            mask_morph=True, mask=mask)
        viz.visualize_optical_flow_on_event_mask(
            flow, None, file_prefix="m_polar", mask_color="black",
            mask_morph=True, mask=mask, polar=self._polar(flow))
        a = cv2.imread(str(tmp_path / "m_host0.png"))
        b = cv2.imread(str(tmp_path / "m_polar0.png"))
        self._assert_close(a, b)

    def test_polar_pred_gt_shared_scale(self, viz, tmp_path):
        rng = np.random.default_rng(2)
        pred = rng.uniform(-1, 1, (2, 24, 32))
        gt = rng.uniform(-4, 4, (2, 24, 32))
        import cv2
        viz.visualize_optical_flow_pred_and_gt(
            pred, gt, visualize_color_wheel=False,
            pred_file_prefix="c_host_p", gt_file_prefix="c_host_g")
        viz.visualize_optical_flow_pred_and_gt(
            pred, gt, visualize_color_wheel=False,
            pred_file_prefix="c_polar_p", gt_file_prefix="c_polar_g",
            polar_pred=self._polar(pred), polar_gt=self._polar(gt))
        for h, p in (("c_host_p0.png", "c_polar_p0.png"),
                     ("c_host_g0.png", "c_polar_g0.png")):
            a = cv2.imread(str(tmp_path / h))
            b = cv2.imread(str(tmp_path / p))
            self._assert_close(a, b)

    def test_polar_color_wheel_still_saved(self, viz, tmp_path):
        rng = np.random.default_rng(3)
        flow = rng.uniform(-1, 1, (2, 24, 32))
        viz.visualize_optical_flow(None, None, visualize_color_wheel=True,
                                   file_prefix="wf", polar=self._polar(flow))
        assert (tmp_path / "color_wheel.png").exists()


class TestAsyncWriter:
    """Round-4 visualize-on treatment: PNG encode + history render run on a
    single FIFO writer thread when ``async_writes=True`` (the CLI evaluation
    loop sets it); the default stays synchronous (call -> file on disk)."""

    def test_async_bytes_identical_after_flush(self, tmp_path):
        img = (np.arange(24 * 32 * 3) % 251).astype(np.uint8).reshape(24, 32, 3)
        vs = Visualizer((24, 32), save=True, show=False,
                        save_dir=str(tmp_path / "sync"))
        va = Visualizer((24, 32), save=True, show=False,
                        save_dir=str(tmp_path / "async"), async_writes=True)
        vs.visualize_image(img, "foo")
        va.visualize_image(img, "foo")
        va.flush()
        assert ((tmp_path / "sync" / "foo0.png").read_bytes()
                == (tmp_path / "async" / "foo0.png").read_bytes())

    def test_flush_reraises_writer_failure(self, tmp_path):
        va = Visualizer((24, 32), save=True, show=False,
                        save_dir=str(tmp_path), async_writes=True)

        def boom():
            raise ValueError("disk on fire")

        va._enqueue(boom)
        with pytest.raises(RuntimeError, match="async artifact write"):
            va.flush()
        va.flush()  # error is consumed; the writer thread stays usable
        va.visualize_image(np.zeros((24, 32), np.uint8), "ok")
        va.flush()
        assert (tmp_path / "ok0.png").exists()

    def test_video_assembly_flushes_queue(self, tmp_path):
        va = Visualizer((24, 32), save=True, show=False,
                        save_dir=str(tmp_path), async_writes=True)
        img = np.zeros((24, 32), np.uint8)
        for i in range(3):
            va.visualize_image(img + 40 * i, "seq")
        out = va.visualize_sequential_images_as_video("seq")
        assert out and os.path.exists(out)
        for i in range(3):
            assert (tmp_path / f"seq{i}.png").exists()


class TestHistoryPlotPersistentFigure:
    def test_updated_figure_matches_fresh_render(self, tmp_path):
        """set_data + relim on the persistent figure produces the same PNG
        as a fresh matplotlib figure (measured 2x cheaper per frame)."""
        h1 = {"a": np.linspace(1, 0, 50), "b": np.linspace(2, 0.5, 50)}
        h2 = {"a": np.linspace(3, 0.1, 80), "b": np.linspace(1, 0.2, 80)}
        va = Visualizer((24, 32), save=True, show=False,
                        save_dir=str(tmp_path / "a"))
        va.visualize_scipy_history(h1)
        va.visualize_scipy_history(h2)  # persistent-figure update path
        vb = Visualizer((24, 32), save=True, show=False,
                        save_dir=str(tmp_path / "b"))
        vb.visualize_scipy_history(h2)  # fresh figure
        assert ((tmp_path / "a" / "optimization_steps1.png").read_bytes()
                == (tmp_path / "b" / "optimization_steps0.png").read_bytes())

    def test_series_set_change_rebuilds_figure(self, tmp_path):
        va = Visualizer((24, 32), save=True, show=False, save_dir=str(tmp_path))
        va.visualize_scipy_history({"a": np.linspace(1, 0, 9)})
        va.visualize_scipy_history({"a": np.linspace(1, 0, 9),
                                    "c": np.linspace(4, 2, 9)})
        vb = Visualizer((24, 32), save=True, show=False,
                        save_dir=str(tmp_path / "fresh"))
        vb.visualize_scipy_history({"a": np.linspace(1, 0, 9),
                                    "c": np.linspace(4, 2, 9)})
        assert ((tmp_path / "optimization_steps1.png").read_bytes()
                == (tmp_path / "fresh" / "optimization_steps0.png").read_bytes())


class TestEventRenderBincount:
    def test_matches_add_at_formula(self, tmp_path):
        """The bincount signed histogram is bit-identical to the np.add.at
        reference formula (4x faster at 2^21 events)."""
        rs = np.random.RandomState(7)
        n = 4096
        ev = np.stack([rs.randint(0, 24, n), rs.randint(0, 32, n),
                       rs.rand(n), rs.randint(0, 2, n)], axis=1).astype(float)
        viz = Visualizer((24, 32), save=True, show=False, save_dir=str(tmp_path))
        viz.visualize_event(ev, file_prefix="binc")
        x = np.clip(ev[:, 0], 0, 23).astype(np.int32)
        y = np.clip(ev[:, 1], 0, 31).astype(np.int32)
        pol = ev[:, 3] * 2 - 1
        img = np.zeros((24, 32))
        np.add.at(img, (x, y), pol)
        expect = np.clip(img * 20 + 127, 0, 255).astype(np.uint8)
        import cv2
        got = cv2.imread(str(tmp_path / "binc0.png"), cv2.IMREAD_GRAYSCALE)
        np.testing.assert_array_equal(got, expect)

    def test_optuna_history_persistent_matches_fresh(self, tmp_path):
        va = Visualizer((24, 32), save=True, show=False,
                        save_dir=str(tmp_path / "a"))
        va.visualize_optuna_history(np.linspace(5, 1, 30))
        va.visualize_optuna_history(np.linspace(4, 0.5, 45))  # update path
        vb = Visualizer((24, 32), save=True, show=False,
                        save_dir=str(tmp_path / "b"))
        vb.visualize_optuna_history(np.linspace(4, 0.5, 45))  # fresh figure
        assert ((tmp_path / "a" / "sampler_history1.png").read_bytes()
                == (tmp_path / "b" / "sampler_history0.png").read_bytes())


class TestIncrementalVideoStream:
    """Round-5 incremental video assembly (VERDICT r4 #4): frames of a
    registered prefix stream into ``cv2.VideoWriter`` on the writer thread
    as they are produced; the post-loop "make video" step releases the
    writer instead of re-reading every PNG."""

    def _frames(self, n, h=48, w=64, seed=0):
        rng = np.random.default_rng(seed)
        return [rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                for _ in range(n)]

    def test_video_stream_matches_rebuild(self, tmp_path):
        """Streamed mp4 is byte-identical to the PNG re-read rebuild (PNG
        is lossless, so both paths feed mp4v the same frame sequence)."""
        from event_based_bos_tpu.utils.video import write_video

        frames = self._frames(12)
        v = Visualizer((48, 64), save=True, show=False,
                       save_dir=str(tmp_path / "s"), async_writes=True)
        v.enable_video_stream("vid")
        for f in frames:
            v.visualize_image(f, file_prefix="vid")
        out = v.visualize_sequential_images_as_video("vid")
        assert out.endswith("vid.mp4")
        # stream actually engaged (no fallback): rebuild into a separate
        # file from the PNGs and compare bytes
        pngs = [str(tmp_path / "s" / f"vid{i}.png") for i in range(12)]
        rebuilt = write_video(pngs, str(tmp_path / "rebuilt.mp4"), 20.0)
        assert rebuilt is not None
        a = open(out, "rb").read()
        b = open(rebuilt, "rb").read()
        assert a == b

    def test_video_stream_grayscale_and_sync_writer(self, tmp_path):
        """2-D uint8 frames (gray PNGs) stream identically to the rebuild,
        also without the async writer (the synchronous inline path)."""
        from event_based_bos_tpu.utils.video import write_video

        rng = np.random.default_rng(3)
        v = Visualizer((48, 64), save=True, show=False,
                       save_dir=str(tmp_path / "g"), async_writes=False)
        v.enable_video_stream("gray")
        for _ in range(6):
            v.visualize_image(rng.integers(0, 255, (48, 64), dtype=np.uint8),
                              file_prefix="gray")
        out = v.visualize_sequential_images_as_video("gray")
        pngs = [str(tmp_path / "g" / f"gray{i}.png") for i in range(6)]
        rebuilt = write_video(pngs, str(tmp_path / "rebuilt.mp4"), 20.0)
        assert open(out, "rb").read() == open(rebuilt, "rb").read()

    def test_incomplete_stream_falls_back_to_png_rebuild(self, tmp_path):
        """A prefix whose earlier frames predate the stream (resume-shaped
        gap) rebuilds from PNGs — same mp4 as a never-streamed run."""
        from event_based_bos_tpu.utils.video import write_video

        frames = self._frames(8, seed=1)
        v = Visualizer((48, 64), save=True, show=False,
                       save_dir=str(tmp_path / "r"), async_writes=True)
        # frames 0-2 written BEFORE the stream exists
        for f in frames[:3]:
            v.visualize_image(f, file_prefix="vid")
        v.flush()
        v.enable_video_stream("vid")
        for f in frames[3:]:
            v.visualize_image(f, file_prefix="vid")
        out = v.visualize_sequential_images_as_video("vid")
        pngs = [str(tmp_path / "r" / f"vid{i}.png") for i in range(8)]
        rebuilt = write_video(pngs, str(tmp_path / "rebuilt.mp4"), 20.0)
        assert open(out, "rb").read() == open(rebuilt, "rb").read()

    def test_out_of_order_frames_reorder_in_stream(self, tmp_path):
        """Sequential-mesh finalize order is lane-major, not time order —
        the stream's reorder buffer must still emit index order."""
        from event_based_bos_tpu.utils.video import write_video

        frames = self._frames(6, seed=2)
        v = Visualizer((48, 64), save=True, show=False,
                       save_dir=str(tmp_path / "o"), async_writes=True)
        v.enable_video_stream("vid")
        for i in (3, 0, 4, 1, 5, 2):
            v.set_frame_index(i)
            v.visualize_image(frames[i], file_prefix="vid")
        v.set_frame_index(None)
        out = v.visualize_sequential_images_as_video("vid")
        pngs = [str(tmp_path / "o" / f"vid{i}.png") for i in range(6)]
        rebuilt = write_video(pngs, str(tmp_path / "rebuilt.mp4"), 20.0)
        assert open(out, "rb").read() == open(rebuilt, "rb").read()
