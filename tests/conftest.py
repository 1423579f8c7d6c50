"""Test configuration: 8-virtual-device CPU jax (TPU-mesh analog).

The heavy lifting (escaping the axon TPU plugin, which ignores
``JAX_PLATFORMS=cpu`` once ``PALLAS_AXON_POOL_IPS`` is set) happens in
``_pytest_env_bootstrap.py`` via pytest.ini's ``-p`` hook -- it re-execs the
whole pytest process with a cleaned env BEFORE output capture starts. The
setdefaults below cover environments without the axon vars.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)
