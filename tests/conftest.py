import os

# Force JAX onto a virtual 8-device CPU mesh for tests; bench and production
# runs use the real TPU.  NOTE: the axon TPU-tunnel plugin ignores
# JAX_PLATFORMS, so we must use jax.config (and JAX_PLATFORM_NAME for any
# subprocesses) before the backend initializes.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
# The persistent compilation cache exists for the minutes-long TPU tunnel
# compiles; on CPU the cache READ alone costs ~20 s per kernel (entries are
# serialized for another machine type) - disable it for tests.
os.environ["FAMSA_TPU_JAX_CACHE"] = "0"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

REF_TEST = pathlib.Path("/root/reference/test")


@pytest.fixture(scope="session")
def ref_test_dir():
    return REF_TEST
