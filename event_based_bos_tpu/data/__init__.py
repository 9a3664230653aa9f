"""Dataset loaders (registry parity: ``src/data_loader/__init__.py:13-27``)."""

from .base import DATASET_ROOT_DIR, DataLoaderBase  # noqa: F401
from .ccs import CcsDataLoader  # noqa: F401
from .e2vid import E2vidDataLoader  # noqa: F401
from .helium import HeliumDataLoader  # noqa: F401
from .synthetic import SyntheticBosConfig, generate_sequence  # noqa: F401
from .synthetic_loader import SyntheticDataLoader  # noqa: F401

collections = {
    cls.NAME: cls
    for cls in (CcsDataLoader, E2vidDataLoader, HeliumDataLoader,
                SyntheticDataLoader)
}
