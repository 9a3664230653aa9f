"""Multi-chip scaling: device meshes, event-axis sharding, batched sweeps.

The reference is strictly single-process (SURVEY §5: no distributed code);
the TPU-native scaling story is:

  * **data axis** — independent frames / sequences / hyper-parameter sweeps
    vmapped and sharded across chips (embarrassingly parallel);
  * **event axis** — the per-event warp + bilinear-vote scatter sharded over
    chips, partial vote images reduced with ``psum`` over ICI;
  * everything expressed with ``jax.sharding.Mesh`` + ``shard_map`` — XLA
    inserts the collectives.
"""

from .mesh import make_mesh  # noqa: F401
from .sharding import (  # noqa: F401
    make_multichip_estimator,
    make_multichip_multistart,
    make_multichip_sequential,
    sharded_polarity_votes,
)
from .sweep import hyperparam_sweep, stack_events  # noqa: F401
