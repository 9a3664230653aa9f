"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np

__all__ = ["make_mesh"]


def make_mesh(axis_shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data", "event"),
              devices=None) -> jax.sharding.Mesh:
    """Build a mesh over the available devices.

    With no ``axis_shape``, devices are split as evenly as possible between a
    leading ``data`` axis and a trailing ``event`` axis (data gets the larger
    power-of-two factor ≤ √n).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_shape is None:
        d = 1
        while d * 2 <= n // (d * 2) * (d * 2) and (n % (d * 2) == 0) and d * d * 4 <= n:
            d *= 2
        if n % d != 0:
            d = 1
        axis_shape = (d, n // d)
    assert int(np.prod(axis_shape)) == n, (axis_shape, n)
    dev_array = np.asarray(devices).reshape(axis_shape)
    return jax.sharding.Mesh(dev_array, tuple(axis_names[: len(axis_shape)]))
