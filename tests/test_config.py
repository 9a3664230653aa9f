"""Tests for the config/CLI layer (propagation parity)."""

import numpy as np
import pytest
import yaml

from event_based_bos_tpu.utils.config import (
    PivSettings,
    load_config_openpiv,
    parse_args,
    propagate_config,
)


def base_config():
    return {
        "data": {"root": "", "dataset": "SYNTHETIC", "sequence": "plume0",
                 "height": 240, "width": 320},
        "output_dir": "/tmp/x",
        "evaluation": {"metrics": ["flow"], "time_list": [[0.0, 1.0]]},
        "common_params": {"n_frames": 2, "xmin": 10, "xmax": 200,
                          "ymin": 20, "ymax": 300},
        "solver": {"filter": {"filters": None, "parameters": {}},
                   "method": "patch_eklt_pyramid2"},
        "method": "opencv_flow",
        "estimation_method": "solver",
        "params_opencv_flow": {"pyr_scale": 0.5},
        "params_openpiv": {"windowsizes": [32], "overlap": [16]},
    }


class TestPropagateConfig:
    def test_roi_copied_everywhere(self):
        cfg = base_config()
        propagate_config(cfg)
        # parity: config_utils.propagate_config (config_utils.py:42-88)
        assert cfg["data"]["xmin"] == 10
        assert cfg["solver"]["filter"]["parameters"]["ymax"] == 300
        assert cfg["data"]["crop_height"] == 190
        assert cfg["data"]["crop_width"] == 280
        assert cfg["solver"]["pad_x0"] == 10
        assert cfg["solver"]["pad_x1"] == 40
        assert cfg["solver"]["pad_y0"] == 20
        assert cfg["solver"]["pad_y1"] == 20
        assert cfg["evaluation"]["dt"] == 2
        assert cfg["params_opencv_flow"]["pad_x1"] == 40
        # absent sections get created with pad info
        assert cfg["params_rife"]["pad_y0"] == 20

    def test_parse_args(self, tmp_path):
        cfg = base_config()
        p = tmp_path / "c.yaml"
        p.write_text(yaml.safe_dump(cfg))
        config, args = parse_args(argv=["--config_file", str(p), "--eval",
                                        "--log", "debug"])
        assert args.eval and args.log == "debug"
        assert config["data"]["crop_height"] == 190

    def test_piv_settings(self):
        cfg = base_config()
        s = load_config_openpiv(cfg["params_openpiv"], cfg["common_params"],
                                "/tmp")
        assert s.roi == (10, 200, 20, 300)
        assert s.windowsizes == (32,) and s.num_iterations == 1
        full = load_config_openpiv({"ROI": "full", "windowsizes": [16],
                                    "overlap": [8]}, cfg["common_params"],
                                   "/tmp")
        assert full.roi is None
