"""Training entry point (reference L7: ``torch/train.py``).

Usage::

    python -m sqtpu.train [--model resnet_sq] [--loss implicit]
                          [--batch-size 32] [--max-epochs 100] ...

Every hardcoded constant of the reference script is a CLI flag here
(see :class:`sqtpu.utils.config.TrainConfig`).
"""

from __future__ import annotations

import sys

from sqtpu.training.loop import train
from sqtpu.utils.config import TrainConfig, parse_cli


def main(argv=None):
    cfg = parse_cli(TrainConfig, argv)
    if cfg.platform:
        import jax
        jax.config.update("jax_platforms", cfg.platform)
    from sqtpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    train(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
