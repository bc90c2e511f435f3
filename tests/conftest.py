"""Test env: run everything on the CPU backend with 8 virtual devices so
the whole suite (incl. multi-chip sharding tests) needs no TPU."""

import os

# NOTE: the environment pins JAX_PLATFORMS=axon (TPU tunnel) via a site
# package, so plain env vars are not enough; jax.config wins.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# persistent compilation cache: repeated test runs skip recompiles.
# OCV_TEST_CACHE_DIR points the suite at its own cache when a TPU
# process is live on the default dir - concurrent cache writes from two
# processes have segfaulted jax's put_executable_and_time (r4).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("OCV_TEST_CACHE_DIR", "/tmp/ocv_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def lenna_gray():
    from oclcomputervision_tpu.utils import load_gray

    return load_gray("lenna.png")


@pytest.fixture(scope="session")
def lenna_rgb():
    from oclcomputervision_tpu.utils import load_image

    return load_image("lenna.png")


@pytest.fixture(scope="session")
def under_exposure_gray():
    from oclcomputervision_tpu.utils import load_gray

    return load_gray("under_exposure.jpg")


@pytest.fixture(scope="session")
def frames_gray():
    from oclcomputervision_tpu.utils import load_gray

    return load_gray("frame10.png"), load_gray("frame11.png")


@pytest.fixture(scope="session")
def flow_gt():
    from oclcomputervision_tpu.utils import asset_path, read_flo

    return read_flo(asset_path("flow10.flo"))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
