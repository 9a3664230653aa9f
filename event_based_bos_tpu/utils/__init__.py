"""Host-side utilities: config/CLI, logging, metrics IO, video, tracing."""

from .config import (  # noqa: F401
    PivSettings,
    load_config_openpiv,
    parse_args,
    propagate_config,
    save_config,
)
from .misc import (  # noqa: F401
    check_key_and_bool,
    fix_random_seed,
    profile,
    read_flow_error_text,
)
from .video import concat_videos_horizontally, extract_mp4, write_video  # noqa: F401
