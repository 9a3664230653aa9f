"""Core data types for the TPU-native event-based BOS framework.

Design notes
------------
The reference framework (tub-rip/event_based_bos) represents an event batch as
a ragged ``(n, 4)`` float64 array of ``(x, y, t, p)`` rows, where **x is the
height (row) coordinate and y is the width (column) coordinate**
(see reference ``src/data_loader/ccs.py:293-296`` and
``src/event_image_converter.py:342-344``).  Ragged shapes are hostile to XLA:
every window would trigger a recompile.  Here events are a fixed-capacity
struct-of-arrays (:class:`Events`) carrying an explicit validity mask, so every
kernel is shape-stable under ``jax.jit`` and masking replaces filtering.

All kernels in :mod:`event_based_bos_tpu.ops` accept and return this type.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Events(NamedTuple):
    """Fixed-capacity batch of camera events (struct of arrays).

    Attributes:
        x: ``[(b,) n]`` float array. Row (height-direction) coordinate.
        y: ``[(b,) n]`` float array. Column (width-direction) coordinate.
        t: ``[(b,) n]`` float array. Timestamp in seconds.
        p: ``[(b,) n]`` float array. Polarity. Positive events have ``p > 0``.
        valid: ``[(b,) n]`` bool array. True where the slot holds a real event.

    The capacity ``n`` is static; the number of live events is
    ``valid.sum()``.  Mirrors the reference's ``(n, 4)`` array
    (``src/utils/event_utils.py:18-47``) with an added mask.
    """

    x: jax.Array
    y: jax.Array
    t: jax.Array
    p: jax.Array
    valid: jax.Array

    @property
    def capacity(self) -> int:
        return self.x.shape[-1]

    def count(self) -> jax.Array:
        """Number of live events (traced value)."""
        return jnp.sum(self.valid, axis=-1)

    def astype(self, dtype) -> "Events":
        return Events(
            self.x.astype(dtype),
            self.y.astype(dtype),
            self.t.astype(dtype),
            self.p.astype(dtype),
            self.valid,
        )

    def mask_where(self, keep: jax.Array) -> "Events":
        """Return a copy with ``valid &= keep`` (masking = filtering)."""
        return self._replace(valid=jnp.logical_and(self.valid, keep))

    def to_numpy(self) -> np.ndarray:
        """Compact to the reference's ragged ``(n, 4)`` ndarray (host only)."""
        x, y, t, p, valid = (np.asarray(a) for a in self)
        m = valid.astype(bool)
        return np.stack([x[m], y[m], t[m], p[m]], axis=-1)


def events_from_arrays(
    x, y, t, p, capacity: Optional[int] = None, dtype=jnp.float32
) -> Events:
    """Build an :class:`Events` batch from dense per-field arrays.

    Pads (with invalid slots) or truncates to ``capacity``.  Accepts numpy or
    jax arrays of equal length.
    """
    x = jnp.asarray(x, dtype)
    y = jnp.asarray(y, dtype)
    t = jnp.asarray(t, dtype)
    p = jnp.asarray(p, dtype)
    n = x.shape[-1]
    valid = jnp.ones((n,), bool)
    ev = Events(x, y, t, p, valid)
    if capacity is not None and capacity != n:
        ev = pad_events(ev, capacity)
    return ev


def bucket_capacity(n: int, minimum: int = 4096) -> int:
    """Smallest power-of-two capacity ≥ n (≥ minimum).

    Padding every event window to a power-of-two bucket bounds the number of
    distinct shapes — and therefore jit retraces — the per-frame programs
    ever see (a handful per run instead of one per window).
    """
    import math

    return max(minimum, 1 << math.ceil(math.log2(max(n, 1))))


def events_from_ndarray(
    events: np.ndarray, capacity: Optional[int] = None, dtype=jnp.float32
) -> Events:
    """Convert the reference-format ``(n, 4)`` array ``(x, y, t, p)``."""
    events = np.asarray(events)
    if events.size == 0:
        cap = capacity or 0
        z = jnp.zeros((cap,), dtype)
        return Events(z, z, z, z, jnp.zeros((cap,), bool))
    return events_from_arrays(
        events[..., 0], events[..., 1], events[..., 2], events[..., 3],
        capacity=capacity, dtype=dtype,
    )


def pad_events(ev: Events, capacity: int) -> Events:
    """Pad (invalid slots appended) or truncate to a new static capacity."""
    n = ev.capacity
    if capacity == n:
        return ev
    if capacity < n:
        return Events(*(a[..., :capacity] for a in ev))
    pad = capacity - n
    widths = [(0, 0)] * (ev.x.ndim - 1) + [(0, pad)]

    def _pad(a):
        return jnp.pad(a, widths)

    return Events(_pad(ev.x), _pad(ev.y), _pad(ev.t), _pad(ev.p), _pad(ev.valid))


# ---------------------------------------------------------------------------
# Quantized wire format (serving-path device upload)
# ---------------------------------------------------------------------------
#
# Uploading events as 4×float32 + bool costs 17 B/event over the host↔device
# link — the dominant serving cost on a slow tunnel (docs/performance.md).
# Camera streams are natively integer-coordinate (the CCS HDF5 stores int16
# x/y and int32 µs — ``ccs.py:50-69``; ``native/ebt_runtime.cpp:48-69``
# already produces that SoA), so the wire format packs:
#     x, y  → uint16 fixed-point (coordinate × 32: exact for 1/32-px-aligned
#             coords up to 2047 px, which includes all integer raw streams)
#     p     → int8 raw polarity (±1 and 0/1 streams round-trip bit-exactly)
#     t     → OPTIONAL int32 µs relative to the window start (the pyramid
#             solver never reads timestamps — its events enter only through
#             the polarity histogram — so its facade omits t entirely), or
#             raw float32 when the stream is off the µs grid (mixed-t tier:
#             same bytes, bitwise-identical decode)
#     count → int32 scalar (validity mask is rebuilt on device)
# = 5 B/event without t (3.4× fewer bytes), 9 B/event with t (1.9×).
# The device-side decode reproduces the float32 ``Events`` BIT-EXACTLY when
# the encoder reports ``exact`` (k/32 with k < 2^16 is representable in f32).

WIRE_SUBPIXEL = 32


def encode_wire_events(events: np.ndarray, capacity: int,
                       include_t: bool = True, mode: str = "exact",
                       t_bitwise: bool = False):
    """Host-side wire encoder; returns a dict of compact np arrays or
    ``None`` when the batch cannot be represented — callers fall back to
    the float32 upload.

    ``t_bitwise=True`` (the facades' opportunistic DEFAULT upload) always
    ships timestamps on the mixed-t f32 tier, even for µs-aligned streams:
    the i32-µs decode is only within ~2 f32 ulps of the direct upload (and
    pads invalid slots with t0, not 0), while the f32 tier is bitwise equal
    on the full padded array — the property the default path's "no
    observable difference" contract requires.

    ``mode="exact"`` (default) additionally rejects batches that would not
    round-trip bit-exactly (sub-1/32-px coordinates or off-µs-grid
    timestamps).  ``mode="round"`` accepts those by snapping onto the wire
    grid — coordinate error ≤ 1/64 px and timestamp error ≤ 0.5 µs, both
    orders of magnitude below the solver's own noise floor — so
    continuous-time or undistorted (sub-pixel) streams still get the
    compact upload.  Out-of-range values (coords outside [0, 2047.97] px)
    force the fallback in both modes.

    Mixed-t tier (round 5): when x/y/p fit the exact wire but the
    timestamps do not (continuous-time streams, windows ≥ 2^31 µs),
    ``mode="exact"`` ships ``t_f32`` — the raw float32 timestamps — instead
    of rejecting the batch.  Same 9 B/event (f32 t = i32 µs), and the
    decode is then *bitwise* equal to the direct float32 upload on every
    field, which is what lets the facades use the exact wire as the
    DEFAULT upload path (``solver/wire.py``) rather than an opt-in.
    """
    if mode not in ("exact", "round"):
        raise ValueError(f"unknown wire mode {mode!r}")
    events = np.asarray(events)
    n = min(len(events), capacity)
    ev = events[:n]
    if n == 0:
        out = {"x_q": np.zeros(capacity, np.uint16),
               "y_q": np.zeros(capacity, np.uint16),
               "p": np.zeros(capacity, np.int8),
               "count": np.int32(0)}
        if include_t:
            out["t_us"] = np.zeros(capacity, np.int32)
            out["t0"] = np.float32(0)
        return out
    # Non-finite values pass every range/exactness comparison below (NaN
    # compares False), so an explicit gate is required — otherwise a glitched
    # batch would be "validated" into arbitrary uint16 events instead of
    # falling back to the float32 upload where the NaN stays visible.
    cols = (0, 1, 2, 3) if include_t else (0, 1, 3)
    if not np.isfinite(ev[:, cols]).all():
        return None
    xs = ev[:, 0] * WIRE_SUBPIXEL
    ys = ev[:, 1] * WIRE_SUBPIXEL
    xq = np.rint(xs)
    yq = np.rint(ys)
    if (xq.min() < 0 or yq.min() < 0
            or xq.max() >= 65536 or yq.max() >= 65536):
        return None
    if mode == "exact":
        # The contract is bit-exactness of the decoded float32 Events vs the
        # direct float32 upload, so verify by actual round-trip equality
        # (decode computes q · 2⁻⁵ — exact for integer q < 2¹⁶ — so the
        # host-side reconstruction below matches the device decode bitwise).
        # A tolerance on |xs − xq| would silently quantize values within the
        # tolerance but more than 1 f32 ulp off the grid.
        if not np.array_equal((xq / WIRE_SUBPIXEL).astype(np.float32),
                              ev[:, 0].astype(np.float32)):
            return None
        if not np.array_equal((yq / WIRE_SUBPIXEL).astype(np.float32),
                              ev[:, 1].astype(np.float32)):
            return None
    # Polarity ships raw (not sign-collapsed): CCS HDF5 streams carry 0/1,
    # synthetic/EVT3 carry ±1 — the decode must reproduce whatever the direct
    # float32 upload would have held (voxel ops read p's *value*, not just
    # the p>0 predicate — ops/voxel.py).
    ps = ev[:, 3]
    pq = np.rint(ps)
    if pq.min() < -128 or pq.max() > 127:
        return None
    if mode == "exact" and not np.array_equal(
            pq.astype(np.float32), ps.astype(np.float32)):
        return None
    out = {"x_q": np.zeros(capacity, np.uint16),
           "y_q": np.zeros(capacity, np.uint16),
           "p": np.zeros(capacity, np.int8),
           "count": np.int32(n)}
    out["x_q"][:n] = xq.astype(np.uint16)
    out["y_q"][:n] = yq.astype(np.uint16)
    out["p"][:n] = pq.astype(np.int8)
    if include_t:
        if t_bitwise:
            out["t_f32"] = np.zeros(capacity, np.float32)
            out["t_f32"][:n] = ev[:, 2].astype(np.float32)
            return out
        t0 = float(ev[:, 2].min())
        rel = (ev[:, 2] - t0) * 1e6
        tus = np.rint(rel)
        # timestamps must be µs-aligned for the i32-µs wire to be faithful
        # (raw camera streams are — the CCS HDF5 stores int32 µs); "round"
        # mode snaps off-grid times (≤ 0.5 µs error).  In "exact" mode an
        # off-grid (or out-of-range) stream takes the mixed-t tier instead:
        # raw float32 timestamps ride the wire (same 4 B/event as i32 µs)
        # and decode bitwise-identically to the direct float32 upload.
        # 1e-4 µs: safely above the f64 rounding noise of (t − t0)·1e6 on a
        # µs-integer stream (~5e-7 µs at 2³¹ µs windows) and far below any
        # genuinely off-grid timestamp; the decoded i32-µs t is within ~2
        # f32 ulps of the direct upload (decode docstring) — t_us's "exact"
        # contract is grid membership, not bitwise equality, because its
        # decode involves a non-power-of-two multiply.
        t_fits_grid = tus.max() < 2**31
        if mode == "exact" and (not t_fits_grid
                                or np.max(np.abs(rel - tus)) > 1e-4):
            out["t_f32"] = np.zeros(capacity, np.float32)
            out["t_f32"][:n] = ev[:, 2].astype(np.float32)
            return out
        if not t_fits_grid:
            return None
        out["t_us"] = np.zeros(capacity, np.int32)
        out["t_us"][:n] = tus.astype(np.int32)
        out["t0"] = np.float32(t0)
    return out


def decode_wire_events(wire: dict, dtype=jnp.float32) -> Events:
    """Device-side decode (jit this per capacity): rebuilds the float32
    :class:`Events` from the quantized wire arrays.  Timestamps decode to
    ``t0 + µs·1e-6`` (within ~2 float32 ulps of the direct upload for the
    µs-aligned batches the encoder accepts), pass through bitwise from the
    mixed-t tier's ``t_f32``, or decode to zeros when the producer omitted
    them."""
    x_q = wire["x_q"]
    cap = x_q.shape[-1]
    scale = jnp.asarray(1.0 / WIRE_SUBPIXEL, dtype)
    x = x_q.astype(dtype) * scale
    y = wire["y_q"].astype(dtype) * scale
    p = wire["p"].astype(dtype)
    if "t_us" in wire:
        t = wire["t0"].astype(dtype) + wire["t_us"].astype(dtype) * jnp.asarray(
            1e-6, dtype)
    elif "t_f32" in wire:
        t = wire["t_f32"].astype(dtype)
    else:
        t = jnp.zeros((cap,), dtype)
    valid = jnp.arange(cap) < wire["count"]
    return Events(x, y, t, p, valid)


@dataclasses.dataclass
class FlowPatch:
    """Single patch descriptor (API parity with the reference's
    ``src/types/flow_patch.py:10-91``: center, shape, flow, derived bounds).

    The solvers operate on whole :class:`PatchGrid` fields; this object is a
    convenience for code migrating from the reference.
    """

    x: float = 0.0
    y: float = 0.0
    shape: Tuple[int, int] = (0, 0)
    u: float = 0.0
    v: float = 0.0

    @property
    def position(self) -> np.ndarray:
        return np.array([self.x, self.y])

    @property
    def flow(self) -> np.ndarray:
        return np.array([self.u, self.v])

    @property
    def x_min(self) -> float:
        return self.x - self.shape[0] / 2

    @property
    def x_max(self) -> float:
        return self.x + self.shape[0] / 2

    @property
    def y_min(self) -> float:
        return self.y - self.shape[1] / 2

    @property
    def y_max(self) -> float:
        return self.y + self.shape[1] / 2

    def update(self, u: float, v: float) -> None:
        self.u = float(u)
        self.v = float(v)


@dataclasses.dataclass(frozen=True)
class PatchGrid:
    """Regular grid of square patches tiling an image.

    Functional replacement for the reference's per-patch ``FlowPatch``
    dataclass dictionary (``src/types/flow_patch.py:10-91`` built in
    ``src/solver/patch_eklt.py:70-95`` / ``patch_eklt_pyramid2.py:85-111``).
    Instead of a dict of objects we keep the grid geometry and derive center /
    bound arrays vectorially.

    Attributes:
        image_size: full image (H, W).
        patch_size: patch (h, w).
        stride: sliding window (h, w).
        offset: (h, w) subtracted from every center (pyramid2 ``offset``).
    """

    image_size: Tuple[int, int]
    patch_size: Tuple[int, int]
    stride: Tuple[int, int]
    offset: Tuple[float, float] = (0.0, 0.0)

    @property
    def shape(self) -> Tuple[int, int]:
        """(rows, cols) of the patch grid.

        Matches ``np.arange(0, H - ph + sh, sh)`` of the reference
        (``patch_eklt.py:86-87``).
        """
        h, w = self.image_size
        ph, pw = self.patch_size
        sh, sw = self.stride
        nr = len(range(0, h - ph + sh, sh)) if h - ph + sh > 0 else 0
        nc = len(range(0, w - pw + sw, sw)) if w - pw + sw > 0 else 0
        return nr, nc

    @property
    def n_patch(self) -> int:
        nr, nc = self.shape
        return nr * nc

    def centers(self) -> Tuple[np.ndarray, np.ndarray]:
        """Patch center coordinates ``(cx[rows, cols], cy[rows, cols])``."""
        h, w = self.image_size
        ph, pw = self.patch_size
        sh, sw = self.stride
        cx = np.arange(0, h - ph + sh, sh, dtype=np.float64) + ph / 2 - self.offset[0]
        cy = np.arange(0, w - pw + sw, sw, dtype=np.float64) + pw / 2 - self.offset[1]
        return np.meshgrid(cx, cy, indexing="ij")

    def bounds(self):
        """Per-patch (x_min, x_max, y_min, y_max) arrays of grid shape.

        Mirrors ``FlowPatch.x_min/x_max/y_min/y_max``
        (``src/types/flow_patch.py:34-67``: min = center - size/2).
        """
        cx, cy = self.centers()
        ph, pw = self.patch_size
        return cx - ph / 2, cx + ph / 2, cy - pw / 2, cy + pw / 2

    def roi_mask(self, xmin, xmax, ymin, ymax) -> np.ndarray:
        """Boolean mask of patches whose center lies inside the ROI.

        Mirrors the patch-skip logic of ``patch_eklt.py:112-115`` /
        ``patch_eklt_dependent.py:65-68`` (centers outside [min, max] are
        excluded; boundary-inclusive).
        """
        cx, cy = self.centers()
        return (
            (cx >= xmin) & (cx <= xmax) & (cy >= ymin) & (cy <= ymax)
        )
