"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a host-platform mesh (the driver's
``dryrun_multichip`` does the same); the real-TPU path is exercised by
bench.py on hardware.

The environment ships an 'axon' PJRT plugin (TPU tunnel) registered from
sitecustomize in every python process, with JAX_PLATFORMS=axon captured at
import time.  It adds ~11s to backend init, hangs under x64, and stalls
minutes in exit teardown — so tests pin the CPU platform explicitly and drop
the axon factory before any backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

_exit_status = [0]


def pytest_sessionfinish(session, exitstatus):
    _exit_status[0] = int(exitstatus)


def pytest_unconfigure(config):
    # Belt-and-braces: skip any slow plugin atexit teardown; the summary has
    # already been printed and the exit status is preserved.
    import sys
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(_exit_status[0])


@pytest.fixture
def rng():
    return np.random.RandomState(666)
