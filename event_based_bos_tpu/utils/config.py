"""Config / CLI layer: YAML configs with reference-compatible propagation.

Re-design of reference ``src/utils/config_utils.py``: same CLI flags
(``--config_file``, ``--log``, ``--eval``), same YAML schema
(``configs/README.md``), same cross-section propagation of the common ROI
(``config_utils.py:42-88``).  The OpenPIV ``windef.Settings`` factory is
replaced by a plain dataclass consumed by the in-repo PIV implementation
(:mod:`event_based_bos_tpu.piv`) — this image has no openpiv package.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import shutil
import sys
from typing import Optional, Tuple

import yaml

logger = logging.getLogger(__name__)


def parse_args(default_path: str = "./configs/synthetic_plume.yaml", argv=None):
    """CLI parity: ``config_utils.parse_args`` (``config_utils.py:19-39``)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", default=default_path,
                        help="Config file yaml path", type=str)
    parser.add_argument("--log", type=str, default="info",
                        help="Log level: [debug, info, warning, error, critical]")
    parser.add_argument("--eval", action="store_true",
                        help="Enable for evaluation run")
    args = parser.parse_args(argv)
    with open(args.config_file) as f:
        config = yaml.safe_load(f)
    propagate_config(config)
    return config, args


def propagate_config(config: dict) -> None:
    """In-place propagation of common parameters across config sections.

    Parity: ``config_utils.propagate_config`` (``config_utils.py:42-88``):
    ROI copied into data/solver sections; crop and pad geometry derived; eval
    ``dt`` = ``n_frames``; opencv/openpiv parameter sections get pad info.
    """
    for key in ("xmin", "xmax", "ymin", "ymax"):
        config["data"][key] = config["common_params"][key]
        if "solver" in config:
            config["solver"]["filter"]["parameters"][key] = config["common_params"][key]

    config["data"]["crop_height"] = config["data"]["xmax"] - config["data"]["xmin"]
    config["data"]["crop_width"] = config["data"]["ymax"] - config["data"]["ymin"]

    pad_config = {
        "pad_x0": config["common_params"]["xmin"],
        "pad_x1": config["data"]["height"] - config["common_params"]["xmax"],
        "pad_y0": config["common_params"]["ymin"],
        "pad_y1": config["data"]["width"] - config["common_params"]["ymax"],
    }

    if "solver" in config:
        config["solver"]["params_opencv_flow"] = config.get("params_opencv_flow", {})
        config["solver"]["params_openpiv"] = config.get("params_openpiv", {})
        config["solver"].update(pad_config)
        config["solver"]["crop_height"] = config["data"]["crop_height"]
        config["solver"]["crop_width"] = config["data"]["crop_width"]

    if "evaluation" in config:
        config["evaluation"]["dt"] = config["common_params"]["n_frames"]

    for k in ("opencv_flow", "openpiv", "rife", "flowformer"):
        section = f"params_{k}"
        if section in config:
            config[section].update(pad_config)
        else:
            config[section] = dict(pad_config)


def save_config(save_dir: str, file_name: str, log_level: str = "INFO") -> None:
    """Copy the config into the output dir and configure logging
    (``config_utils.py:91-112``)."""
    os.makedirs(save_dir, exist_ok=True)
    shutil.copy(file_name, save_dir)
    level = getattr(logging, log_level.upper(), None)
    if not isinstance(level, int):
        raise ValueError(f"Invalid log level: {log_level}")
    logging.basicConfig(
        handlers=[
            logging.FileHandler(os.path.join(save_dir, "main.log"), mode="w"),
            logging.StreamHandler(sys.stdout),
        ],
        level=level,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
        force=True,
    )


@dataclasses.dataclass
class PivSettings:
    """PIV pipeline settings consumed by :mod:`event_based_bos_tpu.piv`.

    Field-for-field subset of the reference's OpenPIV ``windef.Settings``
    factory (``config_utils.py:116-231``); only the options that affect the
    implemented multipass pipeline are kept, with identical defaults.
    """

    roi: Optional[Tuple[int, int, int, int]] = None  # xmin, xmax, ymin, ymax
    windowsizes: Tuple[int, ...] = (64, 32, 16, 8)
    overlap: Tuple[int, ...] = (32, 16, 8, 4)
    deformation_method: str = "symmetric"  # or "second image"
    subpixel_method: str = "gaussian"
    correlation_method: str = "circular"
    sig2noise_threshold: float = 1.0
    sig2noise_method: str = "peak2peak"
    sig2noise_mask: int = 2
    sig2noise_validate: bool = False
    validation_first_pass: bool = True
    replace_vectors: bool = True
    filter_method: str = "localmean"
    max_filter_iteration: int = 2
    filter_kernel_size: int = 1
    min_max_u_disp: Tuple[float, float] = (-20, 20)
    min_max_v_disp: Tuple[float, float] = (-20, 20)
    std_threshold: float = 5.0
    median_threshold: float = 5.0
    median_size: int = 2
    smoothn: bool = True
    smoothn_p: float = 0.05
    scaling_factor: float = 1.0
    dt: float = 1.0

    @property
    def num_iterations(self) -> int:
        return len(self.windowsizes)


def load_config_openpiv(params_openpiv: dict, common_config: dict,
                        save_dir: str) -> PivSettings:
    """Build PIV settings from the YAML section
    (parity with ``config_utils.load_config_openpiv``)."""
    if params_openpiv.get("ROI") == "full":
        roi = None
    else:
        roi = (common_config["xmin"], common_config["xmax"],
               common_config["ymin"], common_config["ymax"])
    return PivSettings(
        roi=roi,
        windowsizes=tuple(params_openpiv["windowsizes"]),
        overlap=tuple(params_openpiv["overlap"]),
        deformation_method=params_openpiv.get("deformation_method", "symmetric"),
        min_max_u_disp=tuple(params_openpiv.get("MinMax_U_disp", (-20, 20))),
        min_max_v_disp=tuple(params_openpiv.get("MinMax_V_disp", (-20, 20))),
    )
