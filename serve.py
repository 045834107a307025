#!/usr/bin/env python
"""`python serve.py --flags` — serving entry (new-build; the reference has
no serving surface). All logic lives in iinsvae_tpu/cli/serve.py."""
from iinsvae_tpu.cli.serve import main

if __name__ == "__main__":
    main()
