"""Per-pharmacophore generation pool with retry budget and outputs.

Parity target: the `sample_all.py` driver loop (reference
`sample_all.py:69-183`): for each pharmacophore, repeatedly sample batches
(<= batch_size graphs) until `num_samples` molecules pass reconstruction, or
the failure budget (3 x num_samples) is exhausted; accepted molecules must
RDKit-sanitize AND be connected (no '.' in SMILES, :127-135); outputs per-mol
SDF + SMILES txt + pool dump + timing rows.

TPU-first design: one compiled sampler per (batch, ligand-bucket) shape,
cached across pools and pharmacophores; per-graph atom counts become node
masks inside the padded batch, so every retry reuses the same executable.
"""
from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..config import Config
from ..data.batching import pad_sample, pick_bucket, collate, replicate_phore
from ..data.phore import Phore, featurize_phore, parse_phore_file
from ..models.phoregen import PhoreGen
from .decode import decode_batch
from .reconstruct import reconstruct_from_generated_with_edges
from .chem import MolReconsError, mol_to_smiles
from .sampler import GuidanceOpt, Sampler


from .writers import append_sdf, append_timing, write_sdf, write_smiles


class GenerationPipeline:
    def __init__(self, pg: PhoreGen, params,
                 guidance: Optional[Sequence[GuidanceOpt]] = None,
                 sample_nodes_mode: str = "uniform", normal_scale: float = 4.0,
                 add_edge: str = "predicted", batch_size: int = 30,
                 keep_traj: bool = False, seed: int = 2024,
                 unroll: int = 1, sample_steps: int = 0,
                 chunk_steps: int = 0, mesh=None, recon_workers: int = 0):
        self.pg = pg
        self.params = params
        self.cfg = pg.config
        self.sampler = Sampler(pg, guidance=guidance, keep_traj=keep_traj,
                               unroll=unroll, sample_steps=sample_steps)
        # chunk_steps > 0: run the reverse process as several device calls
        # of `chunk_steps` scan iterations each (identical math/PRNG; see
        # Sampler.sample_chunked) — needed under runtimes that cap a single
        # execution's wall-time, harmless on direct hardware
        self.chunk_steps = chunk_steps
        # mesh != None: shard the pool's batch axis over the device mesh —
        # graphs are independent, so the reverse scan partitions with zero
        # collectives (pool-parallel sampling; the sampling analogue of the
        # DP train step, SURVEY.md §2.7). Pool sizes are padded up to a
        # multiple of the mesh size and sliced after decode.
        self.mesh = mesh
        # recon_workers > 0: reconstruction/sanitization runs in a process
        # pool — at compute-bound sampling rates the host-side RDKit repair
        # loops are the pipeline bottleneck (SURVEY.md §7.4); the device
        # samples the next pool while workers chew on the previous one
        self.recon_workers = recon_workers
        self._recon_pool = None
        if recon_workers > 0:
            import concurrent.futures as cf
            import multiprocessing as mp
            # spawn (not fork): the parent holds live device runtimes that
            # do not survive fork; workers import only the jax-free
            # reconstruction stack (see sample/__init__ lazy exports)
            self._recon_pool = cf.ProcessPoolExecutor(
                recon_workers, mp_context=mp.get_context("spawn"))
        self.sample_nodes_mode = sample_nodes_mode
        self.normal_scale = normal_scale
        self.add_edge = add_edge
        self.batch_size = batch_size
        self.keep_traj = keep_traj
        self.seed = seed
        self.key = jax.random.PRNGKey(seed)
        self._compiled = {}  # (B, NL, NP) -> jitted sample fn
        self._count_fn = None

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    # ----- compiled entry points -----
    def _sample_fn(self, shape_key):
        if shape_key not in self._compiled:
            if self.chunk_steps > 0:
                # sample_chunked manages (and caches) its own jitted chunks
                self._compiled[shape_key] = (
                    lambda p, k, b: self.sampler.sample_chunked(
                        p, k, b, self.chunk_steps))
            elif self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                repl = NamedSharding(self.mesh, P())
                axis = self.mesh.axis_names[0]
                # a single sharding per argument applies to every pytree
                # leaf: each batch leaf has a leading graph dim -> P(axis)
                batch_sh = NamedSharding(self.mesh, P(axis))
                self._compiled[shape_key] = jax.jit(
                    lambda p, k, b: self.sampler.sample(p, k, b),
                    in_shardings=(repl, repl, batch_sh))
            else:
                self._compiled[shape_key] = jax.jit(
                    lambda p, k, b: self.sampler.sample(p, k, b))
        return self._compiled[shape_key]

    def _count_interval(self, phore_sample: Dict) -> Tuple[int, int]:
        """Predicted [lower, upper] heavy-atom interval for one phore."""
        if self._count_fn is None:
            self._count_fn = jax.jit(
                lambda p, b: self.sampler.predict_count_interval(p, b))
        batch = collate([phore_sample])
        lo, up = self._count_fn(self.params, batch)
        lo, up = int(np.asarray(lo)[0]), int(np.asarray(up)[0])
        # clamp to the model's hard bounds (reference models/diffusion.py:30-31
        # assumes a trained head; an untrained/degenerate interval would
        # otherwise feed randint an empty range)
        from ..constants import MAX_ATOMS, MIN_ATOMS
        lo = max(MIN_ATOMS, min(lo, MAX_ATOMS))
        up = max(lo, min(up, MAX_ATOMS))
        return lo, up

    # ----- phore preparation -----
    def prepare_phore(self, phore: Phore) -> Dict:
        """Featurize + center + pad one pharmacophore into a sample dict with
        empty ligand stubs (reference `datasets/get_phore_data.py:12-105`).

        Phores with more points than the static `max_phore` shape keep every
        typed feature and have their EX volumes subsampled (same convention
        as training, `data/realcorpus.py::cap_phore` — real testset phores
        run up to 203 points, median 90, almost all EX)."""
        ds = self.cfg.dataset
        n_cr = sum(1 for f in phore.features if f.type == "CR")
        if len(phore.features) - n_cr > ds.max_phore:
            from ..data.realcorpus import cap_phore
            rng = np.random.default_rng(self.seed)
            capped = cap_phore(phore, ds.max_phore, rng)
            print(f"[W] {phore.name}: {len(phore.features)} phore points > "
                  f"max_phore={ds.max_phore}; EX volumes subsampled to "
                  f"{len(capped.features)}")
            phore = capped
        feats, pos, norm, center = featurize_phore(
            phore, ds.data_name, norm_mode="new")
        pos = pos - center
        n_lig = min(ds.ligand_buckets)
        return pad_sample(
            np.zeros(0, np.int32), np.zeros((0, 3), np.float32), None, None,
            feats, pos, norm, center, n_lig, ds.max_phore)

    # ----- one pool -----
    def sample_pool(self, phore_sample: Dict, n_graphs: int,
                    lower: int, upper: int
                    ) -> Tuple[List[Dict], Dict]:
        """One compiled sampling batch -> (decoded per-molecule dicts,
        raw sampler output)."""
        ds = self.cfg.dataset
        n_eff = n_graphs
        if self.mesh is not None:
            # round the pool up to a mesh multiple; the extra rows are
            # real pool members (sampled + decoded + offered for
            # acceptance), not discarded padding — so the guidance-energy
            # batch mean and the pool bookkeeping both see the same batch
            nd = self.mesh.size
            n_eff = ((n_graphs + nd - 1) // nd) * nd
        counts = Sampler.sample_counts(
            self._next_key(), lower, upper, n_eff,
            mode=self.sample_nodes_mode, scale=self.normal_scale)
        n_lig = pick_bucket(int(counts.max()), ds.ligand_buckets)
        batch = replicate_phore(phore_sample, n_eff, counts, n_lig)
        fn = self._sample_fn((n_eff, n_lig, ds.max_phore))
        out = fn(self.params, self._next_key(), batch)
        return decode_batch(
            np.asarray(out["pred_node"]), np.asarray(out["pred_pos"]),
            None if out["pred_edge"] is None else np.asarray(out["pred_edge"]),
            np.asarray(out["lig_mask"]),
            include_bond=self.cfg.model.bond_diffusion), out

    # ----- reconstruction + acceptance -----
    def reconstruct(self, mol_info: Dict):
        """Returns (mol, smiles) or raises MolReconsError."""
        mol = reconstruct_from_generated_with_edges(
            mol_info, add_edge=self.add_edge)
        smiles = mol_to_smiles(mol)
        if smiles is None or "." in smiles:
            raise MolReconsError("disconnected molecule")
        return mol, smiles

    def _write_traj(self, raw: Dict, graph_idx: int, path: str,
                    stride: int = 10) -> None:
        """Decode every `stride`-th sampled state of one graph into an SDF
        trajectory (reference `sample_all.py` --save_traj output)."""
        traj = raw.get("traj")
        if traj is None:
            return
        ka = self.cfg.model.num_atom_classes
        kb = self.cfg.model.num_bond_classes
        node = np.asarray(traj["node"])[:, graph_idx].astype(int)  # [T+1, NL]
        pos = np.asarray(traj["pos"])[:, graph_idx]
        edge = np.asarray(traj["edge"])[:, graph_idx].astype(int)
        mask = np.asarray(raw["lig_mask"])[graph_idx]
        from .chem import SimpleMol
        from .writers import append_sdf
        with open(path, "w") as f:
            for step in range(0, len(node), stride):
                frames = decode_batch(np.eye(ka)[node[step]][None],
                                      pos[step][None],
                                      np.eye(kb)[edge[step]][None],
                                      mask[None],
                                      include_bond=True)
                fr = frames[0]
                mol = SimpleMol(fr["element"], fr["atom_pos"],
                                fr["bond_index"], fr["bond_type"])
                append_sdf(mol, f, name=f"step_{step}")

    # ----- full per-phore loop -----
    def generate(self, phore: Phore, num_samples: int,
                 out_dir: Optional[str] = None,
                 fail_budget_factor: int = 3,
                 save_pool: bool = False, traj_stride: int = 10,
                 traj_prob: float = 1.0,
                 time_budget: float = 0.0) -> Dict:
        """Sample a pool for one pharmacophore.

        `time_budget` (seconds, 0 = unlimited) complements the reference's
        3x fail budget (`sample_all.py:79-82`): failure-heavy
        large-interval phores sample at big-bucket speed, and one such
        phore can starve a multi-phore run for hours — the budget abandons
        after the current batch, keeping whatever was accepted."""
        t0 = time.time()
        name = phore.name or "phore"
        # per-molecule trajectory subsampling (reference --save_traj_prob,
        # `sample_all.py:29,151-153`)
        traj_rng = np.random.default_rng(self.seed)
        phore_sample = self.prepare_phore(phore)
        lower, upper = self._count_interval(phore_sample)
        mols, smiles_list, pool, trajs = [], [], [], []
        n_failed = 0
        budget = fail_budget_factor * num_samples
        cur_batch = self.batch_size
        timed_out = False
        while len(mols) < num_samples and n_failed < budget:
            if time_budget and time.time() - t0 > time_budget:
                timed_out = True
                print(f"[W] {name}: per-phore time budget "
                      f"({time_budget:.0f}s) exhausted with "
                      f"{len(mols)}/{num_samples} accepted", flush=True)
                break
            n = min(cur_batch, num_samples - len(mols))
            try:
                decoded, raw = self.sample_pool(phore_sample, n, lower,
                                                upper)
            except MolReconsError:
                raise
            except jax.errors.JaxRuntimeError as e:
                # device/runtime fault only (the TPU analogue of the
                # reference's per-batch OOM catch, `sample_all.py:95-99`) —
                # programming errors still raise. Count the whole batch
                # against the budget and halve so the retry fits the device
                n_failed += n
                cur_batch = max(1, n // 2)
                print(f"[W] {name}: sampling batch of {n} failed "
                      f"({type(e).__name__}: {str(e)[:120]}); retrying with "
                      f"batch {cur_batch} ({n_failed}/{budget} failures)",
                      flush=True)
                continue
            if save_pool:
                pool.append({k: np.asarray(v) for k, v in raw.items()
                             if k in ("pred_node", "pred_pos", "pred_edge",
                                      "lig_mask")})
            results = None
            if self._recon_pool is not None:
                from .reconstruct import recon_task
                results = list(self._recon_pool.map(
                    recon_task, decoded, [self.add_edge] * len(decoded)))
            for gi, info in enumerate(decoded):
                if len(mols) >= num_samples:
                    break  # surplus mesh-padding rows beyond the ask
                if results is not None:
                    ok, payload = results[gi]
                    if not ok:
                        n_failed += 1
                        continue
                    mol, smi = payload
                else:
                    try:
                        mol, smi = self.reconstruct(info)
                    except MolReconsError:
                        n_failed += 1
                        continue
                mols.append(mol)
                smiles_list.append(smi)
                info["accepted"] = True
                if self.keep_traj and traj_rng.random() < traj_prob:
                    trajs.append((raw, gi))
        elapsed = time.time() - t0

        if out_dir:
            mol_dir = os.path.join(out_dir, name)
            os.makedirs(mol_dir, exist_ok=True)
            for i, mol in enumerate(mols):
                write_sdf(mol, os.path.join(mol_dir, f"{i}.sdf"),
                          name=f"{name}_{i}")
            write_smiles(smiles_list,
                         os.path.join(mol_dir, f"{name}_smiles.txt"))
            append_timing(os.path.join(out_dir, "time_chain.txt"),
                          name, len(mols), elapsed)
            if save_pool and pool:
                # pool dump (reference `*_samples_all.pt`,
                # `sample_all.py:154-167`) as npz
                np.savez_compressed(
                    os.path.join(mol_dir, f"{name}_samples_all.npz"),
                    **{f"{k}_{i}": v for i, d in enumerate(pool)
                       for k, v in d.items() if v is not None})
            if self.keep_traj:
                for i, (raw, gi) in enumerate(trajs):
                    self._write_traj(raw, gi,
                                     os.path.join(mol_dir, f"traj_{i}.sdf"),
                                     stride=traj_stride)
        return {
            "name": name, "mols": mols, "smiles": smiles_list,
            "n_finished": len(mols), "n_failed": n_failed,
            "count_interval": (lower, upper), "seconds": elapsed,
            "abandoned": len(mols) < num_samples,
            "timed_out": timed_out,
        }

    def generate_from_file(self, phore_path: str, num_samples: int,
                           out_dir: Optional[str] = None) -> Dict:
        return self.generate(parse_phore_file(phore_path), num_samples,
                             out_dir)
