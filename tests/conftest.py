"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding tests use a fake 8-device CPU mesh, substituting
for real TPU pod slices (the strategy the reference lacks entirely —
it has no tests at all, see SURVEY.md section 4).

Note: this environment's site customization force-selects the TPU
platform via JAX_PLATFORMS and may import jax before us, so the env
var alone is not enough — we also update the jax config directly.
"""

import os
import sys

_flag = "--xla_force_host_platform_device_count=8"
if _flag not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _flag).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import pathlib

import jax
import pytest

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture
def repo_root():
    return pathlib.Path(__file__).resolve().parent.parent
