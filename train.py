#!/usr/bin/env python
"""Thin wrapper: `python train.py --config configs/train_lig-phore.yml`
(see phoregen_tpu/cli/train.py)."""
from phoregen_tpu.cli.train import main

if __name__ == "__main__":
    main()
