"""Standalone full-pipeline e2e at REFERENCE circuit dimensions on the real
device (no pytest/conftest platform override). Thin CLI over
infimum_tpu.client.e2e.run_reference_e2e; prints one JSON line of phase
timings, exits nonzero on any failure.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from infimum_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    from infimum_tpu.client.e2e import run_reference_e2e

    timings = run_reference_e2e(verbose=True)
    print(json.dumps({
        "ok": True, "platform": jax.devices()[0].platform, **timings,
    }))


if __name__ == "__main__":
    main()
