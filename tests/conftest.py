"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding tests use a fake 8-device CPU mesh, substituting
for real TPU pod slices (the strategy the reference lacks entirely —
it has no tests at all, see SURVEY.md section 4).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
