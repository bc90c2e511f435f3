"""Hardware (real-TPU) test suite.

Unlike tests/ (which pins the CPU backend with 8 virtual devices so the
whole suite runs anywhere), this directory runs against the REAL TPU
chip and is skipped automatically when none is attached. Run with:

    python -m pytest tests_tpu/ -q

It exists for behaviors the CPU interpret backend cannot exercise
(ADVICE r4): Mosaic's dynamic-DMA alignment proofs, whole-array SMEM
BlockSpecs, and reads of uninitialized VMEM scratch consumed only
under all-False masks - all load-bearing in the rebased seeded-ME
kernel.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import pytest

jax.config.update("jax_compilation_cache_dir", "/tmp/ocv_tpu_jax_cache")


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        skip = pytest.mark.skip(reason="no TPU attached (hardware-only suite)")
        for item in items:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
