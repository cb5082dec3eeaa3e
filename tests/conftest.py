"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Must run before jax initializes a backend; pytest imports conftest first.
"""

import os
import sys

# The axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon baked in, so env vars set here are too late — override
# via jax.config instead. Tests always run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compilation cache: XLA-CPU compiles dominate test time otherwise.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ceres_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

from ceres_tpu.render.scenes import data_dir

DATA_DIR = data_dir()


@pytest.fixture(scope="session")
def bunny():
    from ceres_tpu.io.obj import load_obj

    return load_obj(os.path.join(DATA_DIR, "bunny.obj"))


@pytest.fixture(scope="session")
def dragon():
    from ceres_tpu.io.obj import load_obj

    return load_obj(os.path.join(DATA_DIR, "dragon.obj"))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
