"""Core numerical kernels (JAX/XLA; Pallas variants for the hot paths)."""

from . import (  # noqa: F401
    events,
    filters,
    flow,
    gradients,
    image_warp,
    iwe,
    poisson,
    stats,
    voxel,
    warp,
)
from .events import *  # noqa: F401,F403
from .filters import *  # noqa: F401,F403
from .flow import *  # noqa: F401,F403
from .gradients import *  # noqa: F401,F403
from .image_warp import *  # noqa: F401,F403
from .iwe import *  # noqa: F401,F403
from .poisson import *  # noqa: F401,F403
from .stats import *  # noqa: F401,F403
from .voxel import *  # noqa: F401,F403
from .warp import *  # noqa: F401,F403
