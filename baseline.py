#!/usr/bin/env python
"""CLI shim matching the reference entry point `python baseline.py --flags`
(reference baseline.py). All logic lives in iinsvae_tpu/cli/baseline.py."""
from iinsvae_tpu.cli.baseline import main

if __name__ == "__main__":
    main()
