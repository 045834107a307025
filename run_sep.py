#!/usr/bin/env python
"""CLI shim matching the reference entry point `python run_sep.py --flags`
(reference run_sep.py). All logic lives in iinsvae_tpu/cli/run_sep.py."""
from iinsvae_tpu.cli.run_sep import main

if __name__ == "__main__":
    main()
