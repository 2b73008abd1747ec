#!/usr/bin/env python
"""Thin wrapper: `python sample_all.py --ckpt ... --phore ...`
(see phoregen_tpu/cli/sample.py)."""
from phoregen_tpu.cli.sample import main

if __name__ == "__main__":
    main()
