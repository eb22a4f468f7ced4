"""Test config: run on CPU with 8 virtual devices so multi-chip sharding
tests execute anywhere (SURVEY.md §4: multi-device tests via
xla_force_host_platform_device_count)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The environment's TPU plugin overrides JAX_PLATFORMS with its own default;
# the config update below wins over that.
jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: repeated suite runs skip recompiles of the
# (static-shape, cfg-keyed) render/train programs — minutes per run.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest

from nerf_rs_tpu.io.weights import find_lego_assets, load_nerf_params


@pytest.fixture(scope="session")
def assets_dir():
    path = find_lego_assets()
    if path is None:
        pytest.skip("lego_rust pretrained assets not available")
    return path


@pytest.fixture(scope="session")
def lego_params(assets_dir):
    return {
        "coarse": load_nerf_params(assets_dir / "coarse"),
        "fine": load_nerf_params(assets_dir / "fine"),
    }


@pytest.fixture(scope="session")
def golden(assets_dir):
    from nerf_rs_tpu.io.golden import load_golden

    return load_golden(assets_dir / "tf_reference_samples.json")
