#!/usr/bin/env python
"""CLI shim: the reference README spells the baseline entry `baselines.py`
(README.md:12) while the file is baseline.py — both names work here."""
from iinsvae_tpu.cli.baseline import main

if __name__ == "__main__":
    main()
