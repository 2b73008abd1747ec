"""Sampling CLI: `python -m phoregen_tpu.cli.sample --ckpt ... --phore ...`.

Parity target: reference `sample_all.py:20-183` flags and loop: per-phore
pool generation with retry budget, JSON-valued --pos_guidance_opt, node-count
sampling modes, SDF/SMILES/timing outputs. Phore inputs: one or more .phore
paths, a directory, or a file_index.json mapping names to paths.
"""
from __future__ import annotations

import argparse
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="PhoreGen-TPU sampling")
    p.add_argument("--config", type=str, default="",
                   help="YAML config; defaults to the one in the checkpoint")
    p.add_argument("--ckpt", "--check_point", dest="ckpt", type=str,
                   required=True,
                   help="checkpoint prefix (expects <ckpt>.msgpack)")
    p.add_argument("--phore", "--phore_file_list", dest="phore", type=str,
                   nargs="+", required=True,
                   help=".phore files, a directory, or a file_index.json")
    p.add_argument("--result_path", "--outdir", dest="result_path", type=str,
                   default="./results/sampling")
    p.add_argument("--num_samples", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=30)
    p.add_argument("--sample_nodes_mode", type=str, default="uniform",
                   choices=["uniform", "normal"])
    p.add_argument("--normal_scale", type=float, default=4.0)
    p.add_argument("--add_edge", type=str, default="predicted",
                   choices=["predicted", "distance", "openbabel"])
    p.add_argument("--pos_guidance_opt", type=str, default="",
                   help='JSON, e.g. \'[{"type":"atom_prox","min_d":1.0,'
                        '"max_d":3.0},{"type":"center_prox"}]\'')
    p.add_argument("--save_traj", action="store_true")
    p.add_argument("--save_traj_prob", type=float, default=0.0,
                   help="save each accepted molecule's trajectory with this "
                        "probability (reference --save_traj_prob; implies "
                        "trajectory capture when > 0)")
    p.add_argument("--save_pool", action="store_true",
                   help="dump raw sampled pools as <name>_samples_all.npz")
    p.add_argument("--sample_steps", type=int, default=0,
                   help="strided sampling: number of denoiser evaluations "
                        "(0 = all T steps, the reference schedule)")
    p.add_argument("--unroll", type=int, default=1,
                   help="reverse-scan unroll factor (amortizes per-iteration "
                        "runtime overhead; higher = slower compile)")
    p.add_argument("--chunk_steps", type=int, default=0,
                   help="split the reverse scan into device calls of this "
                        "many steps (identical math/PRNG; for runtimes that "
                        "cap single-execution wall-time; 0 = one scan)")
    p.add_argument("--fused_stack", default="",
                   choices=["", "none", "xla", "xla2", "pallas", "pallas3",
                            "pallas2"],
                   help="override denoiser.fused_stack for sampling (the "
                        "whole-layer-stack kernel, ops/layer_stack.py); "
                        "parameter-compatible with any checkpoint of the "
                        "flagship architecture")
    p.add_argument("--fused_block_dtype", default="",
                   choices=["", "float32", "bfloat16"],
                   help="dtype of the fused-stack carries/weights/feature "
                        "matmuls (geometry and softmaxes stay f32). "
                        "bfloat16 measured -15% ms/iter on v5e with the "
                        "round-5 flat stage-B layout (BASELINE.md)")
    p.add_argument("--time_budget", type=float, default=0.0,
                   help="per-phore wall-time budget in seconds (0 = none): "
                        "abandon after the current batch, keeping accepted "
                        "molecules")
    p.add_argument("--edge_mlp_apply", default="",
                   choices=["", "split", "concat"],
                   help="override denoiser.edge_mlp_apply at sampling time "
                        "(trace-time application style of the edge k/v "
                        "MLPs; parameter-compatible — same param tree, "
                        "identical algebra)")
    p.add_argument("--triplet_knn", type=int, default=-1,
                   help="override denoiser.triplet_knn at sampling time "
                        "(0 = exact triplet attention, K>0 = restrict to K "
                        "nearest neighbours; -1 = keep checkpoint config). "
                        "Parameter-compatible: only masks which triplets "
                        "are enumerated.")
    p.add_argument("--force", action="store_true",
                   help="allow quality-collapsing overrides (e.g. sampling "
                        "triplet_knn narrower than the trained K)")
    p.add_argument("--seed", type=int, default=2024)
    p.add_argument("--use_ema", action="store_true",
                   help="sample with the EMA shadow params")
    p.add_argument("--platform", type=str, default="",
                   help="force a JAX platform (e.g. cpu, tpu)")
    p.add_argument("--recon_workers", type=int, default=0,
                   help="reconstruct/sanitize accepted pools in this many "
                        "worker processes (0 = in-process serial); useful "
                        "when device sampling outpaces host-side RDKit "
                        "repair loops")
    p.add_argument("--sample_devices", type=int, default=0,
                   help="shard each sampling pool's batch axis over this "
                        "many devices (0 = all local devices; 1 = no "
                        "sharding). Graphs are independent so the reverse "
                        "scan partitions with zero collectives.")
    return p.parse_args(argv)


def resolve_phore_paths(specs):
    paths = []
    for s in specs:
        if s.endswith(".json"):
            with open(s) as f:
                index = json.load(f)
            base = os.path.dirname(s)
            vals = index.values() if isinstance(index, dict) else index
            for v in vals:
                v = v if isinstance(v, str) else v.get("phore", "")
                if os.path.isabs(v):
                    paths.append(v)
                    continue
                # reference indices carry CWD-relative entries like
                # "./data/.../x.phore" (`file_index.json`); others are
                # relative to the index file. Prefer whichever exists,
                # then the index dir + basename (flat-extracted archives).
                cands = [v, os.path.join(base, v),
                         os.path.join(base, os.path.basename(v))]
                paths.append(next((c for c in cands if os.path.exists(c)),
                                  cands[1]))
        elif os.path.isdir(s):
            paths.extend(sorted(glob.glob(os.path.join(s, "*.phore"))))
        else:
            paths.append(s)
    return paths


def _check_knn_narrowing(args, trained_knn: int, source: str):
    """Guard against sampling triplet_knn below the trained value: measured
    on the round-3 80k flagship to collapse acceptance 42% -> 0/304
    (BASELINE.md "knn-match finding"). Widening (or exact 0) is safe."""
    if args.triplet_knn == trained_knn:
        return
    narrowing = (args.triplet_knn != 0
                 and (trained_knn == 0 or args.triplet_knn < trained_knn))
    if narrowing and not args.force:
        raise SystemExit(
            f"[E] sampling triplet_knn={args.triplet_knn} narrows below "
            f"the {source} triplet_knn={trained_knn}: measured to collapse "
            f"acceptance (42% -> 0/304, BASELINE.md round 3). Use 0 "
            f"(exact), K >= trained, or --force to override.")
    print(f"[W] sampling triplet_knn={args.triplet_knn} != {source} "
          f"triplet_knn={trained_knn}: quality can collapse when narrowing "
          f"below the trained K (BASELINE.md round 3); 0 (exact) or "
          f"K >= trained is safe")


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ..config import config_from_dict, load_config
    from ..models.phoregen import PhoreGen
    from ..sample.pipeline import GenerationPipeline
    from ..sample.sampler import GuidanceOpt
    from ..train.checkpoint import load_checkpoint
    from ..train.state import create_train_state
    from ..data.batching import collate
    from ..data.synthetic import synthetic_sample

    if args.ckpt.endswith(".pt"):
        # reference PyTorch checkpoint (reference `sample_all.py:58-59`):
        # torch-free zip+pickle reader + name map (utils/torch_import.py).
        # Requires --config with denoiser.triplet_mode='dense' (the
        # reference's exact-width triplet parameterization).
        if not args.config:
            raise SystemExit(
                "[E] loading a reference .pt checkpoint requires --config "
                "(a YAML matching the reference architecture, with "
                "model.denoiser.triplet_mode: dense)")
        from ..utils.torch_import import load_reference_checkpoint
        cfg = load_config(args.config)
        if args.triplet_knn >= 0:
            _check_knn_narrowing(args, cfg.model.denoiser.triplet_knn,
                                 "config")
            cfg.model.denoiser.triplet_knn = args.triplet_knn
        if args.fused_stack:
            cfg.model.denoiser.fused_stack = args.fused_stack
        if args.fused_block_dtype:
            cfg.model.denoiser.fused_block_dtype = args.fused_block_dtype
        if args.edge_mlp_apply:
            cfg.model.denoiser.edge_mlp_apply = args.edge_mlp_apply
        pg = PhoreGen(cfg)
        params, pt_meta = load_reference_checkpoint(args.ckpt, cfg)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        if args.use_ema:
            raise SystemExit("[E] --use_ema: reference .pt checkpoints "
                             "are imported as bare model weights")
        print(f"[I] Imported reference checkpoint {args.ckpt} "
              f"(epoch {pt_meta.get('epoch', '?')})")
        return run_pipeline(args, cfg, pg, params)

    with open(args.ckpt + ".json") as f:
        meta = json.load(f)
    if args.config:
        cfg = load_config(args.config)
    else:
        cfg = config_from_dict(meta["config"])
    if args.triplet_knn >= 0:
        trained_knn = int(meta["config"]["model"]["denoiser"]
                          .get("triplet_knn", 0))
        _check_knn_narrowing(args, trained_knn, "trained")
        cfg.model.denoiser.triplet_knn = args.triplet_knn
    if args.fused_stack:
        cfg.model.denoiser.fused_stack = args.fused_stack
    if args.fused_block_dtype:
        cfg.model.denoiser.fused_block_dtype = args.fused_block_dtype
    if args.edge_mlp_apply:
        cfg.model.denoiser.edge_mlp_apply = args.edge_mlp_apply

    pg = PhoreGen(cfg)
    # template params for deserialization
    rng = np.random.default_rng(0)
    example = collate([synthetic_sample(
        rng, cfg.dataset.data_name,
        n_lig=min(cfg.dataset.ligand_buckets),
        n_phore=cfg.dataset.max_phore)])
    params = pg.init_params(jax.random.PRNGKey(0), example)
    state, _ = load_checkpoint(args.ckpt, create_train_state(cfg.train,
                                                             params))
    if args.use_ema:
        ema_on = bool(meta.get("config", {}).get("train", {}).get("ema",
                                                                  False))
        if not ema_on:
            raise SystemExit(
                "[E] --use_ema: this checkpoint was trained with "
                "train.ema=false, so its EMA shadow is the untrained init "
                "copy. Re-run without --use_ema (or retrain with ema=true).")
        params = state.ema_params
    else:
        params = state.params
    tag = (f"step {meta['step']}" if meta.get("release")
           else f"epoch {meta.get('epoch')}")
    print(f"[I] Loaded checkpoint {args.ckpt} ({tag})")
    return run_pipeline(args, cfg, pg, params)


def run_pipeline(args, cfg, pg, params):
    from ..sample.pipeline import GenerationPipeline
    from ..sample.sampler import GuidanceOpt
    guidance = None
    if args.pos_guidance_opt:
        guidance = [GuidanceOpt(**g) for g in
                    json.loads(args.pos_guidance_opt)]

    keep_traj = args.save_traj or args.save_traj_prob > 0
    mesh = None
    n_dev = (jax.local_device_count() if args.sample_devices == 0
             else args.sample_devices)
    if n_dev > 1 and args.chunk_steps > 0:
        print("[W] --sample_devices is ignored with --chunk_steps > 0 "
              "(chunked execution is single-device); running unsharded")
    elif n_dev > 1:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(n_dev, "data", devices=jax.local_devices())
        print(f"[I] Pool-parallel sampling over {n_dev} devices")
    pipeline = GenerationPipeline(
        pg, params, guidance=guidance,
        sample_nodes_mode=args.sample_nodes_mode,
        normal_scale=args.normal_scale, add_edge=args.add_edge,
        batch_size=args.batch_size, keep_traj=keep_traj,
        seed=args.seed, unroll=args.unroll,
        sample_steps=args.sample_steps, chunk_steps=args.chunk_steps,
        mesh=mesh, recon_workers=args.recon_workers)

    os.makedirs(args.result_path, exist_ok=True)
    n_ok = n_fail = 0
    for path in resolve_phore_paths(args.phore):
        from ..data.phore import parse_phore_file
        res = pipeline.generate(parse_phore_file(path), args.num_samples,
                                out_dir=args.result_path,
                                save_pool=args.save_pool,
                                traj_prob=(args.save_traj_prob
                                           if args.save_traj_prob > 0
                                           else 1.0),
                                time_budget=args.time_budget)
        n_ok += res["n_finished"]
        n_fail += res["n_failed"]
        print(f"[I] {res['name']}: {res['n_finished']}/{args.num_samples} "
              f"in {res['seconds']:.1f}s (failed {res['n_failed']}, "
              f"count interval {res['count_interval']})"
              + (" [ABANDONED]" if res["abandoned"] else ""))
    print(f"[I] Total generated: {n_ok}, failed reconstructions: {n_fail}")


if __name__ == "__main__":
    main()
