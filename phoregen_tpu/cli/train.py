"""Training CLI: `python -m phoregen_tpu.cli.train --config configs/x.yml`.

Parity target: reference `train.py:6-31` (argparse --config, host banner,
Run().train) with the TPU runtime underneath. Dataset resolution follows
`get_dataset` (reference `utils/training_utils.py:106-160`): filelists when
configured, else the synthetic corpus (RDKit-less environments).
"""
from __future__ import annotations

import argparse
import os
import socket

import jax


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="PhoreGen-TPU training")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--epochs", type=int, default=None,
                   help="override train.epochs")
    p.add_argument("--synthetic_size", type=int, default=0,
                   help="use N synthetic pairs instead of dataset files")
    p.add_argument("--platform", type=str, default="",
                   help="force a JAX platform (e.g. cpu, tpu)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ..config import load_config
    from ..data.dataset import get_dataset
    from ..train.loop import Run
    cfg = load_config(args.config)
    print(f"[I] Host: {socket.gethostname()} PID: {os.getpid()} "
          f"Devices: {jax.devices()}")

    train_set, valid_set, _ = get_dataset(cfg,
                                          synthetic_size=args.synthetic_size)
    print(f"[I] Dataset: {len(train_set)} train / {len(valid_set)} valid")
    run = Run(cfg)
    history = run.train(train_set, valid_set, epochs=args.epochs)
    print(f"[I] Done. best valid loss "
          f"{run.logger.best_valid:.4f} @ epoch {run.logger.best_epoch}")
    return history


if __name__ == "__main__":
    main()
