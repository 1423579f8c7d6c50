"""Early pytest plugin: re-exec into a true-CPU jax before capture starts.

Loaded via ``addopts = -p _pytest_env_bootstrap`` (pytest.ini). Plugin modules
import BEFORE pytest's fd-level output capture and before jax-touching
conftests, which matters twice over:

* The axon sitecustomize (PYTHONPATH=/root/.axon_site) initializes the
  tunneled-TPU PJRT plugin at interpreter startup while
  ``PALLAS_AXON_POOL_IPS`` is set -- ``JAX_PLATFORMS=cpu`` set any later is
  ignored. Tests must run on a true 8-virtual-device CPU jax (the TPU-mesh
  analog), so the whole pytest process is re-exec'd with a cleaned env.
* Re-execing from tests/conftest.py instead would run inside pytest's global
  capture: the child inherits the capture temp file as fd 1 and the test
  report is silently lost.
"""

import os
import sys

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("_ANQS_TESTS_REEXECED") != "1"
):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["_ANQS_TESTS_REEXECED"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        env,
    )
