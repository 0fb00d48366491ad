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


def _pin_cache_key_determinism():
    """Make the persistent-cache key stable across processes.

    jax's cache key hashes the canonicalized module IR through a zero-copy
    buffer; with the Mosaic (pallas) custom calls in the module, the hashed
    bytes were observed to differ on EVERY process launch (same program,
    identical `_canonicalize_ir` output when copied, different hash when the
    buffer was handed straight to `hash_obj.update`) — i.e. the hash reads
    memory the module no longer owns. Forcing a materialized `bytes` copy
    (which also keeps the buffer alive across the update call) makes the key
    deterministic, turning every warm-cache run from a full recompile
    (~minutes per graph through the tunneled TPU backend) into a load."""
    from jax._src import cache_key as ck

    orig = ck._canonicalize_ir
    if getattr(orig, "_infimum_pinned", False):
        return

    def canonicalize_copy(module, ignore_callbacks):
        return bytes(orig(module, ignore_callbacks))

    canonicalize_copy._infimum_pinned = True
    ck._canonicalize_ir = canonicalize_copy


def enable_persistent_cache(root: str = "/root/repo/.jax_cache") -> str:
    import jax

    path = os.path.join(root, _machine_key())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    try:
        # private-API patch (correct for jax 0.9.0); a future jax may move
        # or change _canonicalize_ir — losing key determinism is acceptable,
        # failing to start the prover is not
        _pin_cache_key_determinism()
    except Exception as e:
        import sys

        print(f"[jaxcache] cache-key determinism pin unavailable on this "
              f"jax version ({type(e).__name__}: {e}); persistent cache "
              f"stays enabled without it", file=sys.stderr, flush=True)
    return path
