"""Package trained flagship weights as a params-only release checkpoint.

The distributable analogue of the reference's published Zenodo `.pt`
weights (reference `sample_all.py:26,58-59`): a ~20 MB msgpack holding only
the model params + a JSON sidecar with the full training config, loadable
directly by `cli/sample.py --ckpt <prefix>`.

Usage:
  python scripts/make_release.py --ckpt /tmp/train_r3/best \
      --out release/flagship_r3 [--use_ema] [--note "..."]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--use_ema", action="store_true")
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from phoregen_tpu.config import config_from_dict, default_config
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.synthetic import synthetic_dataset
    from phoregen_tpu.models.phoregen import PhoreGen
    from phoregen_tpu.train.checkpoint import load_checkpoint, save_release
    from phoregen_tpu.train.state import create_train_state

    with open(args.ckpt + ".json") as f:
        meta = json.load(f)
    cfg = (config_from_dict(meta["config"]) if meta.get("config")
           else default_config("zinc_300"))
    pg = PhoreGen(cfg)
    tmpl = synthetic_dataset(0, 8, max_atoms=12)
    batch = next(iter(PhoreDataLoader(tmpl, cfg, 8, shuffle=False)))
    params = pg.init_params(jax.random.PRNGKey(0), batch)
    state, _ = load_checkpoint(args.ckpt, create_train_state(cfg.train,
                                                             params))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    extra = {"source": args.ckpt}
    if args.note:
        extra["note"] = args.note
    if "step" in meta:
        extra["trained_steps"] = meta["step"]
    save_release(args.out, state, meta.get("config", {}), extra=extra,
                 use_ema=args.use_ema)
    sz = os.path.getsize(args.out + ".msgpack") / 1e6
    print(f"[release] wrote {args.out}.msgpack ({sz:.1f} MB) + .json")


if __name__ == "__main__":
    main()
