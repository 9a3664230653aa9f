"""TPU-native Particle Image Velocimetry (multipass window deformation).

The reference delegates PIV to the external OpenPIV package
(``src/utils/frame_utils.py:196-504``: first_pass → multipass_img_deform with
window deformation, gaussian sub-pixel peaks, vector validation and localmean
replacement, per Settles & Liberzon 2022).  That package is not in this
image, and its Python/numpy pipeline is serial per window.  This module
implements the same algorithm as *batched* JAX: all interrogation windows of
a pass are cross-correlated at once via FFTs, validated and replaced
vectorially — each multipass iteration is a single XLA program.

Used by the frame-based BOS baseline (``method: openpiv``) and by
``evaluate_flow_on_event_grids`` (PIV on event histograms).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops.image_warp import resize_bilinear, sample_bilinear
from .utils.config import PivSettings

__all__ = ["piv_pass", "piv_multipass", "smoothn"]


def _window_grid(shape, window: int, overlap: int):
    """Top-left corners and centers of the interrogation windows."""
    h, w = shape
    stride = window - overlap
    rows = np.arange(0, h - window + 1, stride)
    cols = np.arange(0, w - window + 1, stride)
    return rows, cols


def _extract_windows(img: jax.Array, rows, cols, window: int) -> jax.Array:
    rr, cc = jnp.meshgrid(jnp.asarray(rows), jnp.asarray(cols), indexing="ij")

    def one(r, c):
        return jax.lax.dynamic_slice(img, (r, c), (window, window))

    return jax.vmap(one)(rr.reshape(-1), cc.reshape(-1))


def _gaussian_subpixel(corr: jax.Array, peak_r, peak_c) -> Tuple[jax.Array, jax.Array]:
    """3-point Gaussian peak interpolation (OpenPIV 'gaussian' method)."""
    n, wh, ww = corr.shape
    eps = 1e-12
    idx = jnp.arange(n)

    def val(dr, dc):
        r = jnp.clip(peak_r + dr, 0, wh - 1)
        c = jnp.clip(peak_c + dc, 0, ww - 1)
        return jnp.maximum(corr[idx, r, c], eps)

    c0 = val(0, 0)
    cl, cr = val(-1, 0), val(1, 0)
    cd, cu = val(0, -1), val(0, 1)
    dr = (jnp.log(cl) - jnp.log(cr)) / (
        2 * jnp.log(cl) - 4 * jnp.log(c0) + 2 * jnp.log(cr) - eps)
    dc = (jnp.log(cd) - jnp.log(cu)) / (
        2 * jnp.log(cd) - 4 * jnp.log(c0) + 2 * jnp.log(cu) - eps)
    return (jnp.nan_to_num(dr, nan=0.0, posinf=0.0, neginf=0.0),
            jnp.nan_to_num(dc, nan=0.0, posinf=0.0, neginf=0.0))


def _correlate(wa: jax.Array, wb: jax.Array):
    """Circular FFT cross-correlation of window batches (mean-subtracted)."""
    wa = wa - wa.mean(axis=(-2, -1), keepdims=True)
    wb = wb - wb.mean(axis=(-2, -1), keepdims=True)
    fa = jnp.fft.rfft2(wa)
    fb = jnp.fft.rfft2(wb)
    corr = jnp.fft.irfft2(jnp.conj(fa) * fb, s=wa.shape[-2:])
    return jnp.fft.fftshift(corr, axes=(-2, -1))


def _sig2noise(corr: jax.Array, peak_r, peak_c, method: str, mask: int):
    """Peak-to-peak (or peak-to-mean) detectability ratio."""
    n, wh, ww = corr.shape
    idx = jnp.arange(n)
    peak1 = corr[idx, peak_r, peak_c]
    if method == "peak2mean":
        return peak1 / jnp.maximum(jnp.abs(corr).mean(axis=(-2, -1)), 1e-12)
    rr = jnp.arange(wh)[None, :, None]
    cc = jnp.arange(ww)[None, None, :]
    near = ((jnp.abs(rr - peak_r[:, None, None]) <= mask)
            & (jnp.abs(cc - peak_c[:, None, None]) <= mask))
    masked = jnp.where(near, -jnp.inf, corr)
    peak2 = jnp.max(masked, axis=(-2, -1))
    return peak1 / jnp.maximum(peak2, 1e-12)


def piv_pass(
    frame_a: jax.Array,
    frame_b: jax.Array,
    window: int,
    overlap: int,
    settings: PivSettings,
):
    """One correlation pass; returns (u_col, v_row, s2n) on the window grid."""
    rows, cols = _window_grid(frame_a.shape, window, overlap)
    wa = _extract_windows(frame_a, rows, cols, window)
    wb = _extract_windows(frame_b, rows, cols, window)
    corr = _correlate(wa, wb)
    n = corr.shape[0]
    flat = corr.reshape(n, -1)
    peak = jnp.argmax(flat, axis=-1)
    pr = peak // window
    pc = peak % window
    dr_sub, dc_sub = _gaussian_subpixel(corr, pr, pc)
    # displacement of the pattern a→b: peak offset from the window center
    disp_r = pr.astype(corr.dtype) + dr_sub - window // 2
    disp_c = pc.astype(corr.dtype) + dc_sub - window // 2
    s2n = _sig2noise(corr, pr, pc, settings.sig2noise_method,
                     settings.sig2noise_mask)
    gh, gw = len(rows), len(cols)
    return (disp_c.reshape(gh, gw), disp_r.reshape(gh, gw),
            s2n.reshape(gh, gw))


def _validate(u, v, s2n, settings: PivSettings, first_pass: bool):
    """Vector validation: min/max box, global std, 3×3 median test.

    Parity with the OpenPIV validation chain configured in
    ``config_utils.load_config_openpiv`` (``config_utils.py:186-215``).
    """
    bad = jnp.zeros(u.shape, bool)
    lo_u, hi_u = settings.min_max_u_disp
    lo_v, hi_v = settings.min_max_v_disp
    bad |= (u < lo_u) | (u > hi_u) | (v < lo_v) | (v > hi_v)
    for f in (u, v):
        mu, sd = jnp.mean(f), jnp.std(f)
        bad |= jnp.abs(f - mu) > settings.std_threshold * jnp.maximum(sd, 1e-12)

    def med3(f):
        p = jnp.pad(f, 1, mode="edge")
        stack = jnp.stack([p[i:i + f.shape[0], j:j + f.shape[1]]
                           for i in range(3) for j in range(3)])
        return jnp.median(stack, axis=0)

    bad |= jnp.abs(u - med3(u)) > settings.median_threshold
    bad |= jnp.abs(v - med3(v)) > settings.median_threshold
    if settings.sig2noise_validate:
        bad |= s2n < settings.sig2noise_threshold
    return bad


def _replace_localmean(u, v, bad, iterations: int, ksize: int):
    """Replace invalid vectors by the local mean of valid neighbours.

    OpenPIV ``replace_nans(method="localmean")`` semantics: each of the
    ``max_filter_iteration`` rounds fills only the invalid cells that have at
    least one VALID neighbour in the ``(2k+1)²`` window; freshly filled cells
    become valid for the next round, so holes erode from their borders
    inward.  Cells still unfilled after the final round fall back to the
    global mean of the valid vectors (OpenPIV leaves NaN there, which the
    downstream dense interpolation cannot represent).
    """
    k = 2 * ksize + 1
    kernel = jnp.ones((k, k), u.dtype)
    kernel = kernel.at[ksize, ksize].set(0.0)

    def conv(f):
        return jax.lax.conv_general_dilated(
            f[None, None], kernel[None, None], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]

    for _ in range(iterations):
        good = (~bad).astype(u.dtype)
        cnt = conv(good)
        fillable = bad & (cnt > 0)
        for f_idx in range(2):
            f = u if f_idx == 0 else v
            repl = conv(f * good) / jnp.maximum(cnt, 1.0)
            f = jnp.where(fillable, repl, f)
            if f_idx == 0:
                u = f
            else:
                v = f
        bad = bad & ~fillable
    any_good = jnp.any(~bad)
    mean_u = jnp.where(any_good, jnp.sum(jnp.where(bad, 0.0, u))
                       / jnp.maximum(jnp.sum(~bad), 1), 0.0)
    mean_v = jnp.where(any_good, jnp.sum(jnp.where(bad, 0.0, v))
                       / jnp.maximum(jnp.sum(~bad), 1), 0.0)
    u = jnp.where(bad, mean_u, u)
    v = jnp.where(bad, mean_v, v)
    return u, v


def smoothn(f: jax.Array, s: float) -> jax.Array:
    """DCT penalized-least-squares smoothing (Garcia 2010, "Robust smoothing
    of gridded data in one and higher dimensions with missing values").

    This is the algorithm OpenPIV's ``smoothn.smoothn(u, s=settings
    .smoothn_p)`` applies between PIV passes (reference
    ``frame_utils.py:253-255,289-291`` with the fixed ``smoothn_p = 0.05``
    from ``config_utils.py:223-224``).  With a given ``s`` and uniform
    weights (the PIV fields are fully valid after localmean replacement) the
    solution is a single DCT-domain filter:

        z = IDCT( Γ ⊙ DCT(y) ),   Γ = 1 / (1 + s·Λ²),
        Λ[i, j] = (−2 + 2cos(πi/n)) + (−2 + 2cos(πj/m))

    — the eigenvalues of the discrete Laplacian under Neumann (DCT-II)
    boundary conditions.  Validated against an independent scipy.fft
    implementation of the same formula (``tests/test_ops_flow.py``).
    """
    from jax.scipy import fft as jfft

    n, m = f.shape
    lam = ((-2.0 + 2.0 * jnp.cos(jnp.pi * jnp.arange(n) / n))[:, None]
           + (-2.0 + 2.0 * jnp.cos(jnp.pi * jnp.arange(m) / m))[None, :])
    gamma = (1.0 / (1.0 + s * lam * lam)).astype(f.dtype)
    return jfft.idctn(gamma * jfft.dctn(f, norm="ortho"), norm="ortho")


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 6))
def _one_iteration(frame_a, frame_b, window, overlap, settings_tuple,
                   prev_dense, is_last=False):
    settings = PivSettings(*settings_tuple)
    h, w = frame_a.shape
    if prev_dense is not None:
        gr, gc = jnp.meshgrid(jnp.arange(h, dtype=frame_a.dtype),
                              jnp.arange(w, dtype=frame_a.dtype), indexing="ij")
        du_c, du_r = prev_dense[0], prev_dense[1]
        if settings.deformation_method == "symmetric":
            fa = sample_bilinear(frame_a, gr - du_r / 2, gc - du_c / 2)
            fb = sample_bilinear(frame_b, gr + du_r / 2, gc + du_c / 2)
        else:  # "second image"
            fa = frame_a
            fb = sample_bilinear(frame_b, gr + du_r, gc + du_c)
    else:
        fa, fb = frame_a, frame_b

    u, v, s2n = piv_pass(fa, fb, window, overlap, settings)
    if prev_dense is not None:
        # add back the deformation field sampled at window centers
        rows, cols = _window_grid((h, w), window, overlap)
        rr, cc = np.meshgrid(rows + window // 2, cols + window // 2,
                             indexing="ij")
        u = u + prev_dense[0][rr, cc]
        v = v + prev_dense[1][rr, cc]
    bad = _validate(u, v, s2n, settings,
                    first_pass=prev_dense is None)
    if settings.replace_vectors:
        u, v = _replace_localmean(u, v, bad, settings.max_filter_iteration,
                                  settings.filter_kernel_size)
    if settings.smoothn and (prev_dense is None or not is_last):
        # OpenPIV smooths the first pass unconditionally (``frame_utils.py:
        # 253-255`` — so a single-pass run IS smoothed) and later passes
        # only when more follow (``:289-291`` — the
        # `i < num_iterations - 1` guard)
        u = smoothn(u, settings.smoothn_p)
        v = smoothn(v, settings.smoothn_p)
    dense = jnp.stack([resize_bilinear(u, (h, w)), resize_bilinear(v, (h, w))])
    return dense


def piv_multipass(frame_a: np.ndarray, frame_b: np.ndarray,
                  settings: PivSettings) -> np.ndarray:
    """Full multipass window-deformation PIV.

    Returns a dense ``[2, H, W]`` displacement field in the reference GT
    layout (channel 0 = column displacement, channel 1 = row displacement),
    optionally restricted to ``settings.roi``.
    """
    fa = jnp.asarray(frame_a, jnp.float32)
    fb = jnp.asarray(frame_b, jnp.float32)
    if settings.roi is not None:
        x0, x1, y0, y1 = settings.roi
        fa_c, fb_c = fa[x0:x1, y0:y1], fb[x0:x1, y0:y1]
    else:
        x0 = y0 = 0
        x1, y1 = fa.shape
        fa_c, fb_c = fa, fb

    st = tuple(getattr(settings, f.name) for f in settings.__dataclass_fields__.values())
    dense = None
    passes = [(w_, o_) for w_, o_ in zip(settings.windowsizes, settings.overlap)
              if min(fa_c.shape) >= w_]
    for k, (window, overlap) in enumerate(passes):
        dense = _one_iteration(fa_c, fb_c, int(window), int(overlap), st,
                               dense, k == len(passes) - 1)
    if dense is None:
        raise ValueError("Frames smaller than every interrogation window")
    out = np.zeros((2,) + tuple(fa.shape), np.float32)
    out[:, x0:x1, y0:y1] = np.asarray(dense) / settings.scaling_factor / settings.dt
    return out
