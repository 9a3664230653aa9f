"""event_based_bos_tpu — TPU-native Event-based Background-Oriented Schlieren.

A ground-up JAX / XLA / Pallas re-design of the capabilities of
``tub-rip/event_based_bos`` (Shiba et al., IEEE T-PAMI 2023): dense optical
flow of background-pattern distortion estimated from event-camera streams via
a differentiable generative model, optimized entirely on device.

Subpackages:
  * :mod:`event_based_bos_tpu.ops` — event/image kernels (warp, IWE, blur,
    Sobel, resize, Poisson, voxel, filters).
  * :mod:`event_based_bos_tpu.costs` — functional cost registry.
  * :mod:`event_based_bos_tpu.solver` — whole-ROI and pyramidal patch solvers
    (optimizer loops as ``lax.scan`` on device).
  * :mod:`event_based_bos_tpu.data` — dataset loaders (CCS/E2VID/HELIUM +
    synthetic generator).
  * :mod:`event_based_bos_tpu.parallel` — mesh/sharding helpers.
  * :mod:`event_based_bos_tpu.utils` — config / CLI / logging / metrics IO.
"""

__version__ = "0.1.0"

from . import ops, types  # noqa: F401
from .types import (  # noqa: F401
    Events,
    FlowPatch,
    PatchGrid,
    events_from_arrays,
    events_from_ndarray,
)
