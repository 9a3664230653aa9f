"""The shipped examples must keep working (fast ones run, slow ones parse)."""

import os
import runpy
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


def _run(name):
    return runpy.run_path(os.path.join(EXAMPLES, name), run_name="__main__")


def test_library_quickstart_runs(capsys):
    _run("01_library_quickstart.py")
    out = capsys.readouterr().out
    assert "contrast" in out and "grad" in out


def test_custom_cost_runs(capsys):
    _run("04_custom_cost.py")
    out = capsys.readouterr().out
    assert "divergence" in out and "flow finite: True" in out


@pytest.mark.parametrize("name", ["02_solve_synthetic_frame.py",
                                  "03_multichip_batch.py",
                                  "05_serving_and_sweeps.py"])
def test_slow_examples_compile(name):
    """Syntax/import sanity for the examples too slow for CI."""
    rc = subprocess.run([sys.executable, "-m", "py_compile",
                         os.path.join(EXAMPLES, name)])
    assert rc.returncode == 0
