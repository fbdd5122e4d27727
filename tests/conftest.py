import os

# Force JAX onto a virtual 8-device CPU mesh for sharding tests; bench and
# production runs use the real TPU instead.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import pytest

REF_TEST = pathlib.Path("/root/reference/test")


@pytest.fixture(scope="session")
def ref_test_dir():
    return REF_TEST
