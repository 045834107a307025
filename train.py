#!/usr/bin/env python
"""CLI shim: the reference README's entry `python train.py` (README.md:4-8,
"Simultaneous Range Error Mitigation and Environment Identification") is the
supervised joint path — same driver as run.py."""
from iinsvae_tpu.cli.run import main

if __name__ == "__main__":
    main()
