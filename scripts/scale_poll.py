"""CLI for the production-scale poll harness (client/scale.py): fill a poll
toward the reference runtime bounds, sample-prove batches, print one JSON
line of measured timings + honest projections.

Examples:
  python scripts/scale_poll.py                      # full legal max (5^6-1)
  python scripts/scale_poll.py --messages 2000 --participants 200
  python scripts/scale_poll.py --no-prove           # lifecycle/replay only
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--participants", type=int, default=1022)
    ap.add_argument("--messages", type=int, default=5 ** 6 - 1)
    ap.add_argument("--depth", type=int, default=6,
                    help="interaction (quinary message tree) depth")
    ap.add_argument("--reg-depth", type=int, default=10)
    ap.add_argument("--sample-process", type=int, default=8)
    ap.add_argument("--sample-tally", type=int, default=4)
    ap.add_argument("--no-prove", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the local CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from infimum_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    from infimum_tpu.client.scale import run_scale_poll

    t = run_scale_poll(
        n_participants=args.participants, n_messages=args.messages,
        sample_process=args.sample_process, sample_tally=args.sample_tally,
        registration_depth=args.reg_depth, interaction_depth=args.depth,
        prove=not args.no_prove, verbose=True)
    print(json.dumps({"ok": True,
                      "platform": jax.devices()[0].platform, **t}))


if __name__ == "__main__":
    main()
