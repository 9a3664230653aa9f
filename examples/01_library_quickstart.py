"""Library quickstart: events → IWE → warp → contrast, all jitted.

Runs anywhere JAX runs (CPU or the TPU chip); no dataset needed.

    python examples/01_library_quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from event_based_bos_tpu import events_from_ndarray
from event_based_bos_tpu.ops import create_iwe, warp_event


def main():
    h, w, n = 120, 160, 30_000
    rng = np.random.default_rng(0)

    # a moving edge pattern: events drift by (2, -1) px over the window
    true_flow = np.array([2.0, -1.0])
    t = np.sort(rng.uniform(0.0, 1.0, n))
    x = rng.uniform(10, h - 10, n) + true_flow[0] * t
    y = rng.uniform(10, w - 10, n) + true_flow[1] * t
    p = rng.integers(0, 2, n) * 2 - 1
    ev = events_from_ndarray(np.stack([x, y, t, p], 1), capacity=1 << 15)

    @jax.jit
    def contrast_at(flow_2):
        """Variance of the image of warped events (CMax objective)."""
        dense = jnp.broadcast_to(flow_2[:, None, None], (2, h, w))
        warped = warp_event(ev, dense, "dense-flow", direction="first")
        iwe = create_iwe(warped, (h, w), sigma=1)
        return jnp.var(iwe)

    # the true motion maximizes contrast; gradients flow through the warp
    candidates = [(0.0, 0.0), (2.0, -1.0), (-2.0, 1.0)]
    for c in candidates:
        print(f"flow {c}: contrast {contrast_at(jnp.asarray(c)):.4f}")
    g = jax.grad(contrast_at)(jnp.zeros(2))
    print("grad of contrast at 0 (points toward the motion):", np.asarray(g))


if __name__ == "__main__":
    main()
