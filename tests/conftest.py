import os
import sys

# TPU sharding tests run on a virtual CPU mesh; the real-chip bench is
# exercised separately by bench.py.  The session environment may
# pre-register a tunneled accelerator backend (and override
# JAX_PLATFORMS via its site hook), so force the platform through
# jax.config — tests must never contend for the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in \
        os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") +
        " --xla_force_host_platform_device_count=8").strip()
try:
    import jax
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

REFERENCE_DIR = "/root/reference"
TEST_DATA = os.path.join(REFERENCE_DIR, "test_data")


@pytest.fixture(scope="session")
def test_data_dir():
    if not os.path.isdir(TEST_DATA):
        pytest.skip("reference test_data not available")
    return TEST_DATA
