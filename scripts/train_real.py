"""Flagship training on the real-phore-conditioned mixed corpus.

The quality lever identified in VERDICT round 2: train the flagship model
on (ligand, pharmacophore) pairs whose conditioning matches real `.phore`
inputs (44-203 points, EX-dominated) so sampling on real pharmacophores is
in-distribution. Data is *streamed*: every chunk regenerates fresh anchored
ligands (the 685 bundled real phores cycled with new growth randomness +
free-grown molecules with derived phores), so the model never sees the same
sample twice — data scale was the binding constraint on the round-2 corpus.

The 10 `*_merge` sampling phores (the QUALITY eval set) are held out of
training conditioning.

Usage:
  python scripts/train_real.py --steps 40000 --batch_size 16 \
      --out /tmp/train_real [--resume] [--platform tpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOLDOUT = ["B1MDI3_merge", "O60674_merge", "P03211_merge", "P43254_merge",
           "P46598_merge", "P50120_merge", "Q6L5H6_merge", "Q6NYC1_merge",
           "Q9BZX2_merge", "Q9H7Z6_merge"]


def flagship_config(args):
    from phoregen_tpu.config import default_config
    cfg = default_config("zinc_300")
    ds = cfg.dataset
    ds.ligand_buckets = [32, 48, 64, 80]
    ds.max_phore = 96
    ds.corpus = "mixed"
    cfg.train.batch_size = args.batch_size
    cfg.train.dtype = args.dtype
    cfg.model.denoiser.triplet_knn = args.triplet_knn
    cfg.model.denoiser.remat_layers = True
    if getattr(args, "fused_stack", ""):
        # xla2-under-grad training (rematerialized per layer; parity vs the
        # module path pinned by tests/test_layer_stack.py::
        # test_xla2_grad_matches_xla). Requires scan_layers (flagship).
        cfg.model.denoiser.fused_stack = args.fused_stack
    if getattr(args, "stage2", False):
        # stage-2 fine-tune shape (reference
        # `configs/train_dock-cpx-phore.yml:59-67`: complex-scale pairs,
        # smaller batch, frozen positions per `run/run.py:216`)
        ds.ligand_buckets = [80]
        cfg.train.freeze_pos = True
        cfg.train.optimizer.lr = min(cfg.train.optimizer.lr, 5e-5)
    cfg.finalize()
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40000)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--chunk_samples", type=int, default=8192)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--triplet_knn", type=int, default=32)
    ap.add_argument("--fused_stack", default="",
                    help="denoiser.fused_stack for the train step ('' = "
                         "per-layer flax modules; 'xla2' = the batched-"
                         "einsum fused stack under grad)")
    ap.add_argument("--out", default="/tmp/train_real")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--warm_start", default="",
                    help="stage-2 fine-tune: load model weights only from "
                         "this checkpoint prefix (reference "
                         "`run/run.py:54-56` dataset.checkpoint semantics)")
    ap.add_argument("--stage2", action="store_true",
                    help="fine-tune stage shape: NL=80 bucket, freeze_pos, "
                         "reduced lr (reference "
                         "configs/train_dock-cpx-phore.yml)")
    ap.add_argument("--size_mean", type=float, default=0.0,
                    help="ligand heavy-atom target mean (0 = auto: 23 "
                         "ZINC-like, 32 for --stage2 complex-like)")
    ap.add_argument("--size_std", type=float, default=6.0)
    ap.add_argument("--platform", default="")
    ap.add_argument("--seed", type=int, default=2024)
    ap.add_argument("--ckpt_every", type=int, default=2000)
    ap.add_argument("--eval_every", type=int, default=1000)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import numpy as np

    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.realcorpus import mixed_corpus
    from phoregen_tpu.models.phoregen import PhoreGen
    from phoregen_tpu.train.checkpoint import (load_checkpoint,
                                               save_checkpoint)
    from phoregen_tpu.train.state import create_train_state
    from phoregen_tpu.train.step import make_train_step, make_eval_step

    os.makedirs(args.out, exist_ok=True)
    log_path = os.path.join(args.out, "train_real.log")

    def log(msg):
        line = f"[{time.strftime('%H:%M:%S')}] {msg}"
        print(line, flush=True)
        with open(log_path, "a") as f:
            f.write(line + "\n")

    cfg = flagship_config(args)
    pg = PhoreGen(cfg)
    B = args.batch_size
    size_mean = args.size_mean or (32.0 if args.stage2 else 23.0)
    size_kw = dict(size_mean=size_mean, size_std=args.size_std)

    valid_set = mixed_corpus(args.seed - 1, 1024, holdout=HOLDOUT, **size_kw)
    valid_loader = PhoreDataLoader(valid_set, cfg, B, shuffle=False)

    tmpl = mixed_corpus(args.seed - 2, B, holdout=HOLDOUT, **size_kw)
    tmpl_loader = PhoreDataLoader(tmpl, cfg, B, shuffle=False)
    params = pg.init_params(jax.random.PRNGKey(args.seed),
                            next(iter(tmpl_loader)))
    if args.warm_start:
        from phoregen_tpu.train.checkpoint import load_params_only
        params = load_params_only(args.warm_start, params)
        log(f"warm-started model weights from {args.warm_start}")
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    state = create_train_state(cfg.train, params)

    start_step = 0
    ckpt_prefix = os.path.join(args.out, "last")
    if args.resume and os.path.exists(ckpt_prefix + ".msgpack"):
        state, meta = load_checkpoint(ckpt_prefix, state)
        start_step = int(meta.get("step", 0))
        log(f"resumed from step {start_step}")

    # params_for_mask: required when --stage2 sets train.freeze_pos (the
    # optax freeze mask is built from the param tree structure).
    step_fn = make_train_step(pg, cfg, mesh=None, donate=True,
                              params_for_mask=state.params)
    eval_fn = make_eval_step(pg, cfg)
    log(f"flagship: {n_params / 1e6:.3f}M params, B={B}, dtype={args.dtype}, "
        f"triplet_knn={args.triplet_knn}, buckets="
        f"{cfg.dataset.ligand_buckets}, NP={cfg.dataset.max_phore}, "
        f"platform={jax.devices()[0].platform}")

    def evaluate():
        tot, n = {}, 0
        for vb, real in valid_loader.iter_with_sizes():
            gmask = np.arange(valid_loader.batch_size) < real
            m = eval_fn(state.params, np.uint32(123), vb, gmask)
            for k, v in m.items():
                tot[k] = tot.get(k, 0.0) + float(v) * real
            n += real
        return {k: v / n for k, v in tot.items()}

    step = start_step
    chunk_idx = start_step * B // (args.chunk_samples * 2)
    t_start = time.time()
    graphs_done = 0
    best_valid = float("inf")
    while step < args.steps:
        corpus = mixed_corpus(args.seed + 1000 + chunk_idx,
                              args.chunk_samples, holdout=HOLDOUT,
                              **size_kw)
        chunk_idx += 1
        loader = PhoreDataLoader(corpus, cfg, B, shuffle=True,
                                 seed=args.seed + chunk_idx, augment=True)
        for _ in range(2):  # two passes per chunk, then fresh data
            t_ep = time.time()
            for batch in loader:
                state, metrics = step_fn(state, np.uint32(step), batch)
                step += 1
                graphs_done += B
                if step % 200 == 0:
                    m = {k: round(float(v), 4) for k, v in metrics.items()}
                    rate = graphs_done / (time.time() - t_start)
                    log(f"step {step}: loss={m['loss']:.3f} "
                        f"pos={m.get('loss_pos', 0):.3f} "
                        f"node={m.get('loss_node', 0):.4f} "
                        f"edge={m.get('loss_edge', 0):.4f} "
                        f"count={m.get('loss_count', 0):.3f} "
                        f"({rate:.1f} graphs/s)")
                if step % args.eval_every == 0:
                    ev = evaluate()
                    tag = ""
                    if ev["loss"] < best_valid:
                        best_valid = ev["loss"]
                        save_checkpoint(os.path.join(args.out, "best"),
                                        state, 0, cfg.to_dict(),
                                        {"step": step,
                                         "valid_loss": ev["loss"]})
                        tag = " (best)"
                    log(f"eval @ {step}: loss={ev['loss']:.3f} "
                        f"node_acc={ev.get('node_acc', 0):.3f} "
                        f"edge_acc={ev.get('edge_acc', 0):.3f} "
                        f"node_el={ev.get('node_elem_acc', 0):.3f} "
                        f"edge_el={ev.get('edge_elem_acc', 0):.3f} "
                        f"count_hit={ev.get('count_hit', 0):.3f}{tag}")
                if step % args.ckpt_every == 0:
                    save_checkpoint(ckpt_prefix, state, 0, cfg.to_dict(),
                                    {"step": step})
                    log(f"checkpoint @ {step} -> {ckpt_prefix}")
                if step >= args.steps:
                    break
            loader.epoch += 1
            if step >= args.steps:
                break
    save_checkpoint(ckpt_prefix, state, 0, cfg.to_dict(), {"step": step})
    ev = evaluate()
    log(f"done @ {step}: valid loss={ev['loss']:.3f} "
        f"({json.dumps({k: round(v, 4) for k, v in ev.items()})})")


if __name__ == "__main__":
    main()
