"""Solver layer: functional estimators + the user-facing registry.

Registry parity with ``src/solver/__init__.py:10-16`` — the four reference
solver names map onto the functional estimators here:

  * ``generative_max_likelihood`` → :mod:`.gml` (whole-ROI scalars)
  * ``patch_eklt``                → :mod:`.patch` independent tiled (vmapped)
  * ``patch_eklt_dependent``      → :mod:`.patch` joint field
  * ``patch_eklt_pyramid2``       → :mod:`.pyramid` coarse-to-fine (flagship)
"""

from . import api, generative, gml, patch, pyramid  # noqa: F401
from .api import SolverBase, collections  # noqa: F401
from .generative import GenerativeSpec  # noqa: F401
from .gml import GmlSpec, estimate_frame_gml  # noqa: F401
from .patch import PatchSpec, estimate_frame_dependent, estimate_frame_patch  # noqa: F401
from .pyramid import PyramidSpec, estimate_frame  # noqa: F401

#: functional per-frame estimators (jit these directly for custom pipelines)
functional = {
    "generative_max_likelihood": estimate_frame_gml,
    "patch_eklt": estimate_frame_patch,
    "patch_eklt_dependent": estimate_frame_dependent,
    "patch_eklt_pyramid2": estimate_frame,
}
