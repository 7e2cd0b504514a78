"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Pallas kernels execute in interpreter mode on CPU (kernels/common.py
``default_interpret``), so the identical kernel code is exercised here and
compiled by Mosaic on real TPU hardware.
"""

import os

# Must be set before jax initializes a backend. Override unconditionally:
# the ambient environment may point JAX_PLATFORMS at a tunneled TPU, but the
# test suite always runs on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The ambient sitecustomize registers a tunneled TPU ("axon") PJRT plugin and
# pins JAX_PLATFORMS=axon in a way that survives the env override above, so
# force the platform through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
