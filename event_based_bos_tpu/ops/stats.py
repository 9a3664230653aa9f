"""Statistical helpers: Gaussian pdf, Charbonnier, SSIM.

Re-design of the remaining pieces of reference ``src/utils/stat_utils.py``
(the Sobel module lives in :mod:`.gradients`, Poisson in :mod:`.poisson`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["gaussian_1d", "charbonnier_loss", "ssim"]

SQRT_2PI = math.sqrt(2.0 * math.pi)


def gaussian_1d(mean, std, x):
    """Gaussian pdf value (``stat_utils.py:20-37``)."""
    y = (x - mean) ** 2 / (2.0 * std**2)
    return jnp.exp(-y) / (SQRT_2PI * std)


def charbonnier_loss(delta: jax.Array, alpha: float = 0.45,
                     epsilon: float = 1e-3) -> jax.Array:
    """Robust Charbonnier loss (``stat_utils.py:40-45``)."""
    return jnp.mean((delta**2 + epsilon**2) ** alpha)


def _ssim_window(window_size: int, sigma: float, dtype) -> jax.Array:
    xs = jnp.arange(window_size, dtype=dtype) - window_size // 2
    g = jnp.exp(-(xs**2) / (2 * sigma**2))
    g = g / g.sum()
    return g[:, None] * g[None, :]


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
         size_average: bool = True):
    """Structural similarity with an 11×11 σ=1.5 Gaussian window.

    Parity: the SSIM module (``stat_utils.py:216-285``, derived from the
    standard pytorch-ssim recipe): zero-padded ("same") windowed moments,
    C1 = 0.01², C2 = 0.03².

    Args:
        img1, img2: ``[(b, c,) H, W]``.
    """
    while img1.ndim < 4:
        img1 = img1[None]
        img2 = img2[None]
    b, c, h, w = img1.shape
    win = _ssim_window(window_size, 1.5, img1.dtype)[None, None]
    pad = window_size // 2

    def conv(x):
        return jax.lax.conv_general_dilated(
            x.reshape(b * c, 1, h, w), win, (1, 1),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ).reshape(b, c, h, w)

    mu1 = conv(img1)
    mu2 = conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1_sq
    s2 = conv(img2 * img2) - mu2_sq
    s12 = conv(img1 * img2) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))
