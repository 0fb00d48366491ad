"""Persistent XLA compilation cache, keyed by host machine identity.

The bignum kernels produce large XLA graphs that are slow for XLA:CPU to
compile; a persistent cache makes reruns cheap. JAX's CPU AOT cache entries
embed target machine features but are served across machines with only a
warning ("could lead to execution errors such as SIGILL"), so we key the
cache directory by the host's CPU flags to avoid loading foreign binaries.
"""

from __future__ import annotations

import hashlib
import os


def _machine_key() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.md5(line.encode()).hexdigest()[:16]
    except OSError:
        pass
    import platform

    return hashlib.md5(platform.processor().encode()).hexdigest()[:16]


def enable_persistent_cache(root: str = "/root/repo/.jax_cache") -> str:
    import jax

    path = os.path.join(root, _machine_key())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return path
