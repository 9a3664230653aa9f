"""Event → image conversion (IWE & friends) as XLA kernels.

TPU-native re-design of reference ``src/event_image_converter.py``.  The
reference accumulates bilinear votes with ``np.add.at`` / ``scatter_add_``
(``event_image_converter.py:503-620``); here the same semantics are expressed
as a masked 4-corner scatter-add (``image.at[idx].add``) that XLA compiles to
a TPU scatter, differentiable w.r.t. the (warped) coordinates and weights.
A fused Pallas variant lives in :mod:`event_based_bos_tpu.ops.iwe_pallas`.

Coordinate convention (reference parity): ``x`` is the row / height
coordinate, ``y`` is the column / width coordinate
(``event_image_converter.py:342-344``).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..types import Events

__all__ = [
    "gaussian_kernel1d",
    "gaussian_blur",
    "bilinear_vote",
    "count_image",
    "create_image_from_events",
    "create_iwe",
    "create_polarity_iwe",
    "create_probability_iwe",
    "create_timeimage",
    "create_eventmask",
    "create_iwa",
    "create_iwd",
    "create_iwt",
    "create_eventrate",
]

_EPS = 1e-6  # floor nudge; reference uses 1e-8 (numpy) / 1e-6 (torch)


# ---------------------------------------------------------------------------
# Gaussian blur
# ---------------------------------------------------------------------------

def gaussian_kernel1d(sigma: float, ksize: Optional[int] = None, dtype=jnp.float32):
    """Normalized 1-D Gaussian taps.

    ``ksize=None`` derives the size the way both ``cv2.GaussianBlur`` (non-8U)
    and ``scipy.ndimage.gaussian_filter`` (truncate=4) do: radius
    ``round(4*sigma)`` → ``ksize = 2*radius + 1``.
    """
    if ksize is None:
        radius = max(int(round(4.0 * float(sigma))), 1)
        ksize = 2 * radius + 1
    r = (ksize - 1) // 2
    xs = jnp.arange(-r, r + 1, dtype=dtype)
    k = jnp.exp(-(xs**2) / (2.0 * float(sigma) ** 2))
    return k / jnp.sum(k)


import functools as _functools

import numpy as _np


@_functools.lru_cache(maxsize=None)
def _blur_matrix_np(n: int, sigma: float, ksize: Optional[int], mode: str):
    """Dense ``[n, n]`` 1-D Gaussian blur operator with the border folding
    baked in (``mode`` is a ``np.pad`` mode)."""
    if ksize is None:
        radius = max(int(round(4.0 * float(sigma))), 1)
        ksize = 2 * radius + 1
    r = (ksize - 1) // 2
    xs = _np.arange(-r, r + 1, dtype=_np.float64)
    k = _np.exp(-(xs**2) / (2.0 * float(sigma) ** 2))
    k /= k.sum()
    eye = _np.pad(_np.eye(n), ((r, r), (0, 0)), mode=mode)
    # matrix row i = blur taps gathered through the padded identity
    m = _np.zeros((n, n))
    for j, kj in enumerate(k):
        m += kj * eye[j : j + n, :]
    return m


def gaussian_blur(
    image: jax.Array,
    sigma: float,
    ksize: Optional[int] = None,
    mode: str = "symmetric",
) -> jax.Array:
    """Separable Gaussian blur over the trailing two axes — as two dense
    matmuls with border-folded blur operators (cached per size/σ/mode), so
    large-σ blurs run on the MXU instead of a long conv (the reference's
    σ=10 weight-map blur costs ~33 ms as a TPU conv vs ~1 ms as matmuls).

    Border ``mode`` is a ``jnp.pad`` mode:
      * ``"symmetric"`` = scipy ``reflect`` (edge repeated) — matches the
        reference numpy path ``scipy.ndimage.gaussian_filter``
        (``event_image_converter.py:368-369``).
      * ``"reflect"`` = cv2 ``BORDER_REFLECT_101`` — matches
        ``cv2.GaussianBlur`` used by the solver
        (``generative_max_likelihood.py:564-566``).

    ``ksize=3`` replicates the torchvision path
    (``event_image_converter.py:399-404``).
    """
    if sigma is None or float(sigma) <= 0:
        return image
    h, w = image.shape[-2:]
    mh = jnp.asarray(_blur_matrix_np(h, float(sigma), ksize, mode), image.dtype)
    mw = jnp.asarray(_blur_matrix_np(w, float(sigma), ksize, mode), image.dtype)
    out = jnp.einsum("ij,...jk->...ik", mh, image,
                     preferred_element_type=image.dtype)
    return jnp.einsum("...ik,kl->...il", out, mw.T,
                      preferred_element_type=image.dtype)


# ---------------------------------------------------------------------------
# Bilinear vote (the hot scatter kernel)
# ---------------------------------------------------------------------------

def _corner_data(ev: Events, image_size, padding, weight):
    """Shared corner index/value computation for vote & count.

    Reference semantics (``event_image_converter.py:503-560``): floor with an
    epsilon nudge, 4-neighbour indices, per-corner in-bounds masks, bilinear
    weights ``(1-dx)(1-dy)…`` where ``dx`` is the fractional row offset.
    """
    ph, pw = padding
    h = image_size[0] + 2 * ph
    w = image_size[1] + 2 * pw
    fx = jnp.floor(ev.x + _EPS)
    fy = jnp.floor(ev.y + _EPS)
    dx = ev.x - fx
    dy = ev.y - fy
    r0 = fx.astype(jnp.int32) + ph
    c0 = fy.astype(jnp.int32) + pw

    if isinstance(weight, (int, float)):
        weight = jnp.asarray(weight, ev.x.dtype)
    base = jnp.where(ev.valid, jnp.ones_like(ev.x), 0.0) * weight

    corners = []
    for dr, dc, wgt in (
        (0, 0, (1 - dx) * (1 - dy)),
        (1, 0, dx * (1 - dy)),
        (0, 1, (1 - dx) * dy),
        (1, 1, dx * dy),
    ):
        r = r0 + dr
        c = c0 + dc
        inb = (r >= 0) & (r < h) & (c >= 0) & (c < w)
        idx = jnp.where(inb, r * w + c, 0)
        corners.append((idx, wgt, inb))
    return (h, w), base, corners


def bilinear_vote(
    ev: Events,
    image_size: Tuple[int, int],
    weight: Union[float, jax.Array] = 1.0,
    padding: Tuple[int, int] = (0, 0),
) -> jax.Array:
    """Accumulate bilinear votes of events into an image.

    Args:
        ev: events (row ``x``, col ``y`` may be fractional after warping).
        image_size: unpadded (H, W).
        weight: scalar or per-event ``[n]`` weights.
        padding: outer padding (ph, pw); output is ``(H+2ph, W+2pw)``.

    Returns:
        ``[H', W']`` vote image.

    Parity: ``EventImageConverter.bilinear_vote_numpy/tensor``
    (``event_image_converter.py:503-620``).
    """
    (h, w), base, corners = _corner_data(ev, image_size, padding, weight)
    flat = jnp.zeros((h * w,), base.dtype)
    for idx, wgt, inb in corners:
        vals = jnp.where(inb, wgt * base, 0.0)
        flat = flat.at[idx].add(vals, mode="drop")
    return flat.reshape(h, w)


def count_image(
    ev: Events,
    image_size: Tuple[int, int],
    padding: Tuple[int, int] = (0, 0),
) -> jax.Array:
    """Integer-style event count image (each in-bounds corner counts 1).

    Parity: ``EventImageConverter.count_event_numpy/tensor``
    (``event_image_converter.py:407-501``) — note the reference gives every
    event one unit vote at *each* of its four neighbour pixels.
    """
    (h, w), base, corners = _corner_data(ev, image_size, padding, 1.0)
    flat = jnp.zeros((h * w,), base.dtype)
    for idx, _wgt, inb in corners:
        vals = jnp.where(inb, base, 0.0)
        flat = flat.at[idx].add(vals, mode="drop")
    return flat.reshape(h, w)


# ---------------------------------------------------------------------------
# High-level images
# ---------------------------------------------------------------------------

def create_image_from_events(
    ev: Events,
    image_size: Tuple[int, int],
    method: str = "bilinear_vote",
    weight: Union[float, jax.Array] = 1.0,
    sigma: float = 0,
    padding: Tuple[int, int] = (0, 0),
    blur_ksize: Optional[int] = None,
) -> jax.Array:
    """Parity: ``create_image_from_events_numpy`` (``event_image_converter.py:332-370``)."""
    if method == "count":
        image = count_image(ev, image_size, padding)
    elif method == "bilinear_vote":
        image = bilinear_vote(ev, image_size, weight, padding)
    elif method == "polarity":
        image = create_polarity_iwe(ev, image_size, weight, padding)
    else:
        raise NotImplementedError(f"method = {method!r} is not supported.")
    if sigma and sigma > 0:
        image = gaussian_blur(image, sigma, ksize=blur_ksize)
    return image


def create_iwe(
    ev: Events,
    image_size: Tuple[int, int],
    method: str = "bilinear_vote",
    sigma: float = 1,
    padding: Tuple[int, int] = (0, 0),
) -> jax.Array:
    """Image of Warped Events (``event_image_converter.py:51-73``)."""
    return create_image_from_events(ev, image_size, method, 1.0, sigma, padding)


def create_polarity_iwe(
    ev: Events,
    image_size: Tuple[int, int],
    weight: Union[float, jax.Array] = 1.0,
    padding: Tuple[int, int] = (0, 0),
) -> jax.Array:
    """Stacked (positive, negative) vote images, ``[2, H, W]``.

    Parity: the ``"polarity"`` method (``event_image_converter.py:355-363``);
    masking replaces the boolean gather.
    """
    pos = ev.mask_where(ev.p > 0)
    neg = ev.mask_where(ev.p <= 0)
    pos_im = bilinear_vote(pos, image_size, weight, padding)
    neg_im = bilinear_vote(neg, image_size, weight, padding)
    return jnp.stack([pos_im, neg_im], axis=0)


def create_probability_iwe(ev: Events, image_size, prob: jax.Array, sigma: float = 1,
                           padding=(0, 0)) -> jax.Array:
    """IWE weighted by per-event association probability
    (``event_image_converter.py:239-262``)."""
    return create_image_from_events(ev, image_size, "bilinear_vote", prob, sigma, padding)


def create_timeimage(ev: Events, image_size, ts: Optional[jax.Array] = None,
                     sigma: float = 1, padding=(0, 0)) -> jax.Array:
    """Sum-of-timestamps image (``event_image_converter.py:264-286``)."""
    ts = ev.t if ts is None else ts
    return create_image_from_events(ev, image_size, "bilinear_vote", ts, sigma, padding)


def create_eventmask(ev: Events, image_size, padding=(0, 0)) -> jax.Array:
    """``[1, H, W]`` bool mask of pixels receiving any vote
    (``event_image_converter.py:288-301``)."""
    im = create_image_from_events(ev, image_size, "bilinear_vote", 1.0, 0, padding)
    return (im != 0)[None]


def _ratio_image(ev, image_size, per_event, base, sigma, padding):
    """sum(weighted votes)/count pattern shared by IWA / IWD / IWT."""
    s = create_image_from_events(ev, image_size, "bilinear_vote",
                                 per_event - base, 0, padding)
    c = create_image_from_events(ev, image_size, "bilinear_vote", 1.0, 0, padding)
    out = s / (c + 1e-2) + base
    if sigma and sigma > 0:
        out = gaussian_blur(out, sigma)
    return out


def create_iwa(ev: Events, image_size, det_j: jax.Array, sigma: float = 1,
               padding=(0, 0)) -> jax.Array:
    """Image of Warped Area / deformation map (``event_image_converter.py:75-132``)."""
    return _ratio_image(ev, image_size, det_j, 1.0, sigma, padding)


def create_iwd(ev: Events, image_size, div: jax.Array, sigma: float = 1,
               padding=(0, 0)) -> jax.Array:
    """Image of average divergence (``event_image_converter.py:134-182``)."""
    return _ratio_image(ev, image_size, div, 0.0, sigma, padding)


def create_iwt(ev: Events, image_size, trace: jax.Array, sigma: float = 1,
               padding=(0, 0)) -> jax.Array:
    """Image of average trace (``event_image_converter.py:184-234``, base 2)."""
    return _ratio_image(ev, image_size, trace, 2.0, sigma, padding)


def create_eventrate(ev: Events, image_size: Tuple[int, int]) -> jax.Array:
    """Per-pixel max event rate ``max(1/dt)`` between consecutive events.

    The reference loops over events in Python
    (``event_image_converter.py:304-327``); here events are sorted per pixel
    (lexicographic sort by flat pixel id then time) and consecutive same-pixel
    dt's are reduced with a scatter-max.
    """
    h, w = image_size
    xi = jnp.clip(ev.x.astype(jnp.int32), 0, h - 1)
    yi = jnp.clip(ev.y.astype(jnp.int32), 0, w - 1)
    pix = xi * w + yi
    pix = jnp.where(ev.valid, pix, h * w)  # invalid → sentinel bucket
    order = jnp.lexsort((ev.t, pix))
    pix_s = pix[order]
    t_s = ev.t[order]
    same = pix_s[1:] == pix_s[:-1]
    dt = t_s[1:] - t_s[:-1]
    rate = jnp.where(same & (dt > 0) & (pix_s[1:] < h * w), 1.0 / jnp.maximum(dt, 1e-30), 0.0)
    idx = jnp.where(same, pix_s[1:], 0)
    flat = jnp.zeros((h * w,), ev.t.dtype)
    flat = flat.at[idx].max(rate, mode="drop")
    return flat.reshape(h, w)
