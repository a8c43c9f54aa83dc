"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on CPU via
``--xla_force_host_platform_device_count`` (SURVEY.md §4); real-TPU runs use
bench.py / train CLIs instead of the test suite.
"""

import os

# Force-override: the environment pre-sets JAX_PLATFORMS=axon (the real TPU
# tunnel); tests must never compile through it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(items):
    # tiering: anything not slow/compile is the sub-minute "fast" core
    for item in items:
        if not any(m.name in ("slow", "compile") for m in
                   item.iter_markers()):
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
