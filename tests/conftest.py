"""Test configuration: force an 8-device virtual CPU mesh.

Tests run on CPU (fast, deterministic, no TPU needed); multi-chip sharding
tests use the 8 virtual devices. Note: this environment's sitecustomize
(axon TPU tunnel) force-registers the TPU backend at interpreter boot and
overrides JAX_PLATFORMS, so we must override back via jax.config AFTER
importing jax — env vars alone are not enough.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent XLA compile cache: the suite is compile-bound (test_cli_play
# 107 s cold vs 13 s warm on this 1-core host), so repeat runs drop from
# ~30 min to well under the 12-min budget. Override dir via
# JAX_COMPILATION_CACHE_DIR; disable with PFV_TEST_CC=0.
if os.environ.get("PFV_TEST_CC", "1") != "0":
    _cc = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), ".xla_cache"),
    )
    os.makedirs(_cc, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cc)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8

sys.path.insert(0, os.path.dirname(__file__))  # for `oracle` imports

# Modules dominated by whole-video encodes, subprocesses, or interpret-mode
# kernels — marked slow so `pytest -m "not slow"` gives a fast unit-level
# signal (the full suite takes >10 min on a 1-core host).
_SLOW_MODULES = {
    "test_cli",
    "test_dataloader",
    "test_encoding",
    "test_end_to_end",
    "test_gop_concurrent",
    "test_motion_content",
    "test_parallel",
    "test_robustness",
    "test_seq_kernel",
    "test_step_kernel",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.fspath.purebasename in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
