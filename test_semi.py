#!/usr/bin/env python
"""CLI shim matching the reference entry point `python test_semi.py --flags`
(reference test_semi.py). All logic lives in iinsvae_tpu/cli/test_semi.py."""
from iinsvae_tpu.cli.test_semi import main

if __name__ == "__main__":
    main()
