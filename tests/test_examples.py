"""The per-config example scripts (ref: examples/*.py): one drop-in script per
calibrated configuration, each delegating to examples/run_config.py."""

import os
import subprocess
import sys

import pytest

from opticalflow_ri_tpu.configs import CONFIGS, EXAMPLE_CONFIG_NAMES

EXAMPLES_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "examples")


def test_every_example_config_has_a_script():
    for name in EXAMPLE_CONFIG_NAMES:
        path = os.path.join(EXAMPLES_DIR, f"{name}.py")
        assert os.path.exists(path), name
        src = open(path).read()
        # the script pins its own config name and delegates to run_config.py
        assert f'"{name}"' in src, name
        assert "run_config.py" in src, name


def test_example_config_names_registered():
    for name in EXAMPLE_CONFIG_NAMES:
        assert name in CONFIGS


def test_wrapper_execs_into_run_config():
    # the argparse-error path proves the exec chain without touching a device
    script = os.path.join(EXAMPLES_DIR, f"{EXAMPLE_CONFIG_NAMES[0]}.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu", OFRI_DISABLE_PALLAS="1")
    proc = subprocess.run(
        [sys.executable, script, "--no-such-flag"],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert proc.returncode != 0
    assert "run_config.py" in proc.stderr
    assert "unrecognized arguments" in proc.stderr
