"""CLI entry point — `python -m hybrid_diffusion_tpu.cli --state train …`.

Reference-parity dispatch (Main.py:101-109) with honest state names (see
config.py docstring): train | eval (val split) | test (test split;
`inference` accepted as alias).
"""

from __future__ import annotations

import sys

from .config import parse_config


def main(argv=None) -> int:
    config = parse_config(argv)
    config.pprint()

    from .train.loop import evaluate, train

    if config.state == "train":
        print("Training model")
        train(config)
    elif config.state == "eval":
        print("Evaluating model (val split)")
        results = evaluate(config, split="val")
        print(results)
    elif config.state == "test":
        print("Testing model (test split)")
        results = evaluate(config, split="test")
        print(results)
    else:
        print("Invalid state. Use 'train', 'eval', 'test' (or 'inference').")
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
