"""Core numerical kernels (JAX/XLA; Pallas variants for the hot paths)."""

from . import events, gradients, image_warp, iwe, warp  # noqa: F401
from .events import *  # noqa: F401,F403
from .gradients import *  # noqa: F401,F403
from .image_warp import *  # noqa: F401,F403
from .iwe import *  # noqa: F401,F403
from .warp import *  # noqa: F401,F403
