"""Test configuration: force a virtual 8-device CPU platform.

Must run before jax is imported anywhere (hence env mutation at module
import time in conftest, which pytest loads first).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The preinstalled axon TPU plugin overrides JAX_PLATFORMS from the
# environment; the config API wins over the plugin.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synth_root(tmp_path_factory):
    """Session-wide synthetic case tree for all four problems."""
    from cfdbench_tpu.data.synthetic import generate_all

    root = tmp_path_factory.mktemp("synth_data")
    generate_all(root, cases_per_subset=4, num_frames=12, grid=16, seed=0)
    return root


@pytest.fixture()
def rng():
    # Function-scoped: each test gets its own seed-0 stream, so test
    # data does not depend on which rng-consuming tests ran earlier —
    # a tolerance failure reproduces when the test is run alone.
    return np.random.default_rng(0)
