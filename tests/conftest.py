"""Test configuration: force a virtual 8-device CPU platform so multi-chip sharding
paths (Mesh/pjit/shard_map) are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Route sub-32k MSMs to the host Pippenger in tests: XLA:CPU compiling the
# 256-bucket device kernel for a one-shot mid-size MSM (e.g. the tally
# circuit's 4.3k-point queries) costs ~25 minutes on a 2-core host, while
# the host path runs it in seconds.
os.environ.setdefault("INFIMUM_DEVICE_THRESHOLD", "32768")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The container's sitecustomize force-registers the remote "axon" TPU platform;
# override it so unit tests run on the local (8-virtual-device) CPU backend.
jax.config.update("jax_platforms", "cpu")

# Large unrolled bignum graphs are slow for XLA:CPU to compile; cache them
# (keyed per machine: see infimum_tpu/utils/jaxcache.py).
from infimum_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import random

import pytest

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture(scope="session")
def rng():
    return random.Random(0xC0FFEE)
