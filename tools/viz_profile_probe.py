"""One profiled visualize-on run at the benchmark scale: per-section host
timings for the plain default evaluation loop (docs/performance.md
§end-to-end — where the remaining ~1.1 s/frame goes).

Usage:  python tools/viz_profile_probe.py [n_frames]
"""

import logging
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from throughput_probe import build_config  # noqa: E402
from event_based_bos_tpu.utils.misc import (  # noqa: E402
    enable_persistent_cache_if_beneficial,
)

enable_persistent_cache_if_beneficial(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))


def main():
    import yaml

    from event_based_bos_tpu import cli

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = tempfile.mkdtemp(prefix="vizprof_")
    cfg = build_config(os.path.join(out, "run"), n_frames, small=False)
    cfg["pipeline"] = True
    cfg_path = os.path.join(out, "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                        format="%(message)s")
    t0 = time.perf_counter()
    rc = cli.main(["--config_file", cfg_path, "--eval", "--log", "info"])
    print(f"wall={time.perf_counter() - t0:.1f}s rc={rc}")
    shutil.rmtree(out, ignore_errors=True)
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
