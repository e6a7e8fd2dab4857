"""Unified CLI entry point (mirrors src/xview_et/main.py:290-314 flow)."""

from __future__ import annotations

import sys


def main(argv=None, family: str = "et"):
    # multi-process bootstrap must precede any XLA backend creation (module
    # imports below touch jnp) — no-op unless AVDN_NUM_PROCESSES is set
    from avdn_tpu.parallel.runtime import maybe_init_distributed

    maybe_init_distributed()
    from avdn_tpu.config import parse_args
    from avdn_tpu.train.loop import train, valid

    args = parse_args(argv, family=family)
    if args.family:
        family = args.family
        args.family = family
    if args.vision_only:
        print("!!! Vision only")
    if args.language_only:
        print("!!! Language only")
    if args.inference:
        valid(args)
    else:
        train(args)


if __name__ == "__main__":
    main(sys.argv[1:])
