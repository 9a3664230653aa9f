"""Image-gradient kernels: Sobel, central differences.

Re-designs of the reference's gradient machinery:
  * ``cv2.Sobel`` calls in ``generative_max_likelihood.py:207-208`` (frame
    gradients, ksize 3, BORDER_REFLECT_101).
  * ``SobelTorch`` fixed-weight conv module (``src/utils/stat_utils.py:48-139``,
    ksize 3/5, replicate padding) used by ``poisson_to_flow``
    (``patch_eklt_dependent.py:259-281``).
  * ``torch.gradient`` central differences in the ``image_gradient`` cost
    (``src/costs/image_gradient.py:60-76``).

Convention: "x" is the row / height direction throughout (reference parity).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["sobel_kernels", "sobel_xy", "frame_gradients", "poisson_to_flow",
           "central_gradient", "sobel_divergence", "strain_variant"]


def sobel_kernels(ksize: int = 3, dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """(Gx, Gy) Sobel taps; Gx differentiates along rows (height).

    Tap values match ``SobelTorch`` (``stat_utils.py:91-107``).
    """
    if ksize == 3:
        gx = jnp.array([[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]], dtype)
    elif ksize == 5:
        gx = jnp.array(
            [
                [-2, -2, -4, -2, -2],
                [-1, -1, -2, -1, -1],
                [0, 0, 0, 0, 0],
                [1, 1, 2, 1, 1],
                [2, 2, 4, 2, 2],
            ],
            dtype,
        )
    else:
        raise ValueError("ksize must be 3 or 5")
    return gx, gx.T


def _conv2d_same(image: jax.Array, kernel: jax.Array, pad_mode: str) -> jax.Array:
    """2-D valid conv after explicit padding; image ``[..., H, W]``."""
    r = (kernel.shape[0] - 1) // 2
    batch = image.shape[:-2]
    h, w = image.shape[-2:]
    img = image.reshape((-1, 1, h, w))
    img = jnp.pad(img, [(0, 0), (0, 0), (r, r), (r, r)], mode=pad_mode)
    # cross-correlation == cv2/torch conv weights convention
    out = jax.lax.conv_general_dilated(
        img, kernel[None, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out.reshape(batch + (h, w))


def sobel_xy(image: jax.Array, ksize: int = 3, pad_mode: str = "edge") -> Tuple[jax.Array, jax.Array]:
    """(d/drow, d/dcol) Sobel responses with selectable border.

    ``pad_mode="edge"`` replicates ``SobelTorch``'s replicate padding;
    ``pad_mode="reflect"`` replicates cv2's default BORDER_REFLECT_101.
    """
    gx, gy = sobel_kernels(ksize, image.dtype)
    return _conv2d_same(image, gx, pad_mode), _conv2d_same(image, gy, pad_mode)


def frame_gradients(frame: jax.Array, ksize: int = 3, use_log_intensity: bool = False
                    ) -> Tuple[jax.Array, jax.Array]:
    """Frame-intensity gradients feeding the generative model.

    Parity: ``GenerativeMaximumLikelihood._set_frame``
    (``generative_max_likelihood.py:194-213``): optional ``log(I+1)``, then
    ``gradient_x = cv2.Sobel(frame, CV_64F, 0, 1)`` (row direction) and
    ``gradient_y = cv2.Sobel(frame, CV_64F, 1, 0)`` with reflect-101 border.
    """
    if use_log_intensity:
        frame = jnp.log(frame + 1.0)
    return sobel_xy(frame, ksize=ksize, pad_mode="reflect")


def poisson_to_flow(intensity: jax.Array, ksize: int = 3) -> jax.Array:
    """Flow field from a scalar intensity (Poisson) potential: Sobel/8.

    Parity: ``PatchEkltDependent.poisson_to_flow``
    (``patch_eklt_dependent.py:259-281``) — replicate border, divide by 8.

    Args:
        intensity: ``[..., H, W]``.
    Returns:
        ``[..., 2, H, W]`` flow (row, col components).
    """
    dx, dy = sobel_xy(intensity, ksize=ksize, pad_mode="edge")
    return jnp.stack([dx, dy], axis=-3) / 8.0


def sobel_divergence(flow: jax.Array, ksize: int = 3) -> jax.Array:
    """Divergence of a flow field via Sobel: ``(d u/dx + d v/dy)/8``.

    Parity: the documented use of ``SobelTorch`` (``stat_utils.py:50-56``).
    """
    dxx, _ = sobel_xy(flow[..., 0, :, :], ksize, "edge")
    _, dyy = sobel_xy(flow[..., 1, :, :], ksize, "edge")
    return (dxx + dyy) / 8.0


def central_gradient(image: jax.Array, axis: int) -> jax.Array:
    """Second-order central differences, one-sided at edges.

    Matches ``torch.gradient`` / ``np.gradient`` with unit spacing, as used by
    the ``image_gradient`` smoothness cost (``image_gradient.py:69-70``).
    """
    n = image.shape[axis]
    upper = jax.lax.slice_in_dim(image, 2, n, axis=axis)
    lower = jax.lax.slice_in_dim(image, 0, n - 2, axis=axis)
    interior = (upper - lower) / 2.0
    first = jax.lax.slice_in_dim(image, 1, 2, axis=axis) - jax.lax.slice_in_dim(
        image, 0, 1, axis=axis
    )
    last = jax.lax.slice_in_dim(image, n - 1, n, axis=axis) - jax.lax.slice_in_dim(
        image, n - 2, n - 1, axis=axis
    )
    return jnp.concatenate([first, interior, last], axis=axis)


def strain_variant(u: jax.Array, v: jax.Array) -> jax.Array:
    """Strain magnitude variant (``stat_utils.py:203-212``), reflect-101 border."""
    du_dx, du_dy = (g / 8.0 for g in sobel_xy(u, 3, "reflect"))
    dv_dx, dv_dy = (g / 8.0 for g in sobel_xy(v, 3, "reflect"))
    return du_dx**2 + dv_dy**2 + 0.5 * (du_dy + dv_dx) ** 2
