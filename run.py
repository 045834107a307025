#!/usr/bin/env python
"""CLI shim matching the reference entry point `python run.py --flags`
(reference run.py). All logic lives in iinsvae_tpu/cli/run.py."""
from iinsvae_tpu.cli.run import main

if __name__ == "__main__":
    main()
