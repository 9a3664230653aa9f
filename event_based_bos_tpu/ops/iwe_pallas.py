"""Pallas TPU kernel for the bilinear event vote — scatter as a matmul.

The reference accumulates bilinear votes with ``np.add.at`` /
``scatter_add_`` (``event_image_converter.py:503-620``); the XLA port in
:mod:`event_based_bos_tpu.ops.iwe` expresses it as a 4-corner
``image.at[idx].add`` scatter, which TPUs execute as serialized
random-access updates (14.2 ms for the 0.52 M-event signed polarity cache
at 720×1280; this kernel: 4.1 ms — `docs/performance.md` §micro).

Where the win ships (round 5): the isolated 3.4× does NOT survive
embedding — inside the one big jitted frame solve the same program
measures ~10 ms/frame *slower* than the scatter (the Pallas custom call
blocks XLA fusion/scheduling around it).  Dispatched as its OWN small
program feeding the solve (``solver.pyramid.estimate_frame``'s ``cache``
input — the histogram is a once-per-frame constant), the kernel wins for
real: 171.5 → 163.0 ms/frame at the benchmark, cache program 14.3 → 6.2 ms
(``tools/iwe_split_probe.py``, interleaved A/B; bit-identical flows).
The pyramid facade's ``split_iwe_cache: auto`` therefore defaults to this
split-Pallas path on TPU; ``GenerativeSpec.pallas_iwe`` stays the per-spec
switch (``docs/performance.md`` §dispatch split).

This kernel removes the random access entirely by reformulating the vote
as a *dense rank-factored matmul*.  For an event at ``(x, y)`` with value
``s`` the bilinear vote into pixel ``(h, w)`` is exactly

    s · hat(x − h) · hat(y − w),      hat(d) = max(0, 1 − |d|)

so the vote image over a chunk of events is the outer-product sum

    image = Uᵀ · V,   U[e, h] = hat(x_e − h),   V[e, w] = s_e · hat(y_e − w)

— one ``[H, E] × [E, W]`` matmul on the MXU per event chunk, accumulated
in a VMEM-resident f32 image across chunks.  The hat factorization also
reproduces the reference's border semantics for free: a corner that falls
outside the image simply has no hat support at any real row/column
(``event_image_converter.py:521-538`` drops exactly those corners).

Numerics: the MXU runs in float32 by default (measured no slower than
bfloat16 here — the kernel is VPU-bound on the hat-factor build), so the
kernel is exactly the same sum as the scatter up to f32 summation order;
for the per-frame IWE *cache* (integer sensor coordinates,
``patch_eklt.py:271-306``) it is bit-exact, asserted on real TPU and in
``tests/test_pallas_kernel.py``.  ``compute_dtype=jnp.bfloat16`` remains
available; with it fractional (warped) coordinates incur hat rounding
bounded by 2⁻⁹ relative per vote.

Used by :func:`event_based_bos_tpu.solver.generative.polarity_votes` /
``iwe_cache`` when ``GenerativeSpec.pallas_iwe`` is set True.
"""

from __future__ import annotations

import functools
from typing import Tuple, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import Events

__all__ = ["hat_vote_image", "bilinear_vote_pallas", "signed_vote_pallas",
           "polarity_iwe_pallas"]

# set True to run the kernel in interpreter mode (CPU tests)
INTERPRET = False

_LANES = 128
_SUBLANES = 8


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _vote_kernel(x_ref, y_ref, v_ref, out_ref, *, hp: int, wp: int,
                 compute_dtype):
    """One grid step: fold one event chunk into the VMEM accumulator.

    Layout is chosen so the kernel needs *zero* relayouts: ``x`` arrives on
    the lane axis (``[1, E]``) and broadcasts over the row-iota's sublanes;
    ``y``/``v`` arrive on the sublane axis (``[E, 1]``) and broadcast over
    the col-iota's lanes; the contraction is then a standard
    ``[H, E] × [E, W]`` matmul with no operand transpose.  (A first cut
    built both factors as ``[E, ·]`` from lane-resident coords — the two
    per-chunk lane→sublane relayouts + the transposed contraction made it
    *slower* than the XLA scatter.)
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = x_ref[...]                    # [1, E] row coordinates (lanes)
    y = y_ref[...]                    # [E, 1] col coordinates (sublanes)
    v = v_ref[...]                    # [E, 1] signed weights (0 = invalid)
    e = x.shape[1]

    # Mosaic's tpu.iota is integer-only; cast after.
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (hp, e), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (e, wp), 1).astype(jnp.float32)
    ut = jnp.maximum(0.0, 1.0 - jnp.abs(rows - x))        # [H, E]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(cols - y)) * v     # [E, W]
    out_ref[:] += jax.lax.dot_general(
        ut.astype(compute_dtype), w.astype(compute_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def hat_vote_image(
    x: jax.Array,
    y: jax.Array,
    values: jax.Array,
    image_size: Tuple[int, int],
    chunk: int = 1024,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """``Σ_e values_e · hat(x_e − h) · hat(y_e − w)`` → ``[H, W]`` float32.

    Args:
        x, y: ``[n]`` event coordinates (row, col); may be fractional.
            Entries may lie anywhere — votes outside ``image_size`` are
            dropped by construction.  Coordinates must be finite (mask
            invalid slots into ``values`` *and* clamp their coordinates).
        values: ``[n]`` per-event signed weights (0 disables an event).
        image_size: output (H, W).
        chunk: events per grid step (contraction depth of each matmul).
        compute_dtype: MXU input dtype; ``jnp.bfloat16`` or ``jnp.float32``
            (same measured speed — the kernel is bound by the VPU hat-factor
            build, not the MXU — but f32 keeps fractional-coordinate votes
            exact).
    """
    h, w = image_size
    hp = _round_up(max(h, _SUBLANES), _SUBLANES)
    wp = _round_up(max(w, _LANES), _LANES)
    n = x.shape[0]
    np_ = _round_up(n, chunk)
    pad = np_ - n
    xf = jnp.pad(x.astype(jnp.float32), (0, pad), constant_values=-2.0)
    yf = jnp.pad(y.astype(jnp.float32), (0, pad), constant_values=-2.0)
    vf = jnp.pad(values.astype(jnp.float32), (0, pad))
    grid = (np_ // chunk,)
    kernel = functools.partial(_vote_kernel, hp=hp, wp=wp,
                               compute_dtype=compute_dtype)
    # Block shapes must have their last two dims (divisible by 8, divisible
    # by 128) or equal to the array dims: x rides the lane axis of a [1, n]
    # array, y/v ride the sublane axis of [n, 1] arrays (which also gives
    # the kernel its relayout-free broadcasts, see _vote_kernel).
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hp, wp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        interpret=INTERPRET,
    )(xf.reshape(1, -1), yf.reshape(-1, 1), vf.reshape(-1, 1))
    return out[:h, :w]


def _prepared(ev: Events, weight: Union[float, jax.Array], sign: bool):
    """Coordinates clamped finite, weights masked (and signed)."""
    val = jnp.where(ev.valid, jnp.ones_like(ev.x), 0.0)
    if sign:
        val = val * jnp.where(ev.p > 0, 1.0, -1.0)
    if isinstance(weight, (int, float)):
        val = val * float(weight)
    else:
        val = val * weight.astype(val.dtype)
    # hat() needs finite coords; parked/invalid slots can hold anything
    x = jnp.where(ev.valid, ev.x, -2.0).astype(jnp.float32)
    y = jnp.where(ev.valid, ev.y, -2.0).astype(jnp.float32)
    return x, y, val.astype(jnp.float32)


def bilinear_vote_pallas(
    ev: Events,
    image_size: Tuple[int, int],
    weight: Union[float, jax.Array] = 1.0,
    padding: Tuple[int, int] = (0, 0),
    chunk: int = 1024,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Drop-in for :func:`event_based_bos_tpu.ops.iwe.bilinear_vote`.

    Not differentiable w.r.t. the event coordinates — use the XLA scatter
    for paths that backprop through warped events (the generative solvers
    never do: events enter only through the constant measured histogram,
    ``SURVEY.md`` §3.2).
    """
    ph, pw = padding
    x, y, val = _prepared(ev, weight, sign=False)
    return hat_vote_image(x + ph, y + pw,
                          val, (image_size[0] + 2 * ph,
                                image_size[1] + 2 * pw),
                          chunk=chunk, compute_dtype=compute_dtype)


def signed_vote_pallas(
    ev: Events,
    image_size: Tuple[int, int],
    padding: Tuple[int, int] = (0, 0),
    chunk: int = 1024,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Polarity-signed vote image ``pos − neg`` in one pass (the per-frame
    IWE-cache histogram, ``patch_eklt.py:271-306`` semantics)."""
    ph, pw = padding
    x, y, val = _prepared(ev, 1.0, sign=True)
    return hat_vote_image(x + ph, y + pw,
                          val, (image_size[0] + 2 * ph,
                                image_size[1] + 2 * pw),
                          chunk=chunk, compute_dtype=compute_dtype)


def polarity_iwe_pallas(
    ev: Events,
    image_size: Tuple[int, int],
    weight: Union[float, jax.Array] = 1.0,
    padding: Tuple[int, int] = (0, 0),
    chunk: int = 1024,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Stacked (positive, negative) vote images ``[2, H, W]``.

    Drop-in for :func:`event_based_bos_tpu.ops.iwe.create_polarity_iwe`:
    two masked single-image kernels (keeps the accumulator + hat factors
    within one core's VMEM at full 720×1280 scale).
    """
    pos = bilinear_vote_pallas(ev.mask_where(ev.p > 0), image_size, weight,
                               padding, chunk, compute_dtype)
    neg = bilinear_vote_pallas(ev.mask_where(ev.p <= 0), image_size, weight,
                               padding, chunk, compute_dtype)
    return jnp.stack([pos, neg], axis=0)
