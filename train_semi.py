#!/usr/bin/env python
"""CLI shim matching the reference entry point `python train_semi.py --flags`
(reference train_semi.py). All logic lives in iinsvae_tpu/cli/train_semi.py."""
from iinsvae_tpu.cli.train_semi import main

if __name__ == "__main__":
    main()
