"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Tests run on CPU (deterministic, no TPU needed); multi-chip sharding tests
use the 8 virtual devices. Must run before any `import jax`.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(__file__))  # for `oracle` imports
