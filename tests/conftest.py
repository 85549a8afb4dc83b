import os
import sys

# TPU sharding tests run on a virtual CPU mesh; the real-chip bench is
# exercised separately by bench.py.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") +
     " --xla_force_host_platform_device_count=8").strip(),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

REFERENCE_DIR = "/root/reference"
TEST_DATA = os.path.join(REFERENCE_DIR, "test_data")


@pytest.fixture(scope="session")
def test_data_dir():
    if not os.path.isdir(TEST_DATA):
        pytest.skip("reference test_data not available")
    return TEST_DATA
