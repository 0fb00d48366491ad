"""Host-vs-device dispatch thresholds.

The device kernels win by orders of magnitude at production sizes on TPU, but
every distinct kernel shape costs an XLA compile — minutes on a small CPU
host. Small problems therefore run on the host bignum path (same results,
golden-tested against each other); the crossover is platform-dependent.
"""

from __future__ import annotations

import functools
import os


@functools.lru_cache(maxsize=1)
def platform() -> str:
    import jax

    return jax.devices()[0].platform


def device_threshold() -> int:
    """Minimum MSM/fixed-base size routed to the device kernels."""
    env = os.environ.get("INFIMUM_DEVICE_THRESHOLD")
    if env is not None:
        return int(env)
    return 128 if platform() == "tpu" else 4096


def fixed_base_chunk() -> int:
    """Batch size per fixed-base device call. Per-call dispatch through the
    TPU runtime costs ~100ms, so TPU wants few large calls; XLA:CPU compile
    time of the bignum graph scales with batch width, so CPU stays small."""
    env = os.environ.get("INFIMUM_FIXED_BASE_CHUNK")
    if env is not None:
        return int(env)
    return 8192 if platform() == "tpu" else 256


def msm_lanes() -> int:
    """Vector width for the Pippenger accumulation scan: wide enough to fill
    the TPU VPU; narrow on CPU where each lane-add is dispatch-bound."""
    env = os.environ.get("INFIMUM_MSM_LANES")
    if env is not None:
        return int(env)
    return 1024 if platform() == "tpu" else 8
