"""Golden-vector parity pack (VERDICT round-2 item 7).

Serializes tiny fixed-graph inputs and this framework's outputs so a
torch-enabled environment can replay them against the reference PhoreGen
one-for-one later (torch is absent in this image, so cross-checking is
deferred — the pack is the contract).

Contents of tests/fixtures/golden/golden_pack.npz:
- `ref_state/<name>`: the model weights under the REFERENCE's state-dict
  names (`denoiser.base_block.0...`, torch [out,in] Linear layout) — load
  with `model.load_state_dict({k: torch.tensor(v), ...})`. The config is
  the reference architecture at tiny scale (triplet mode 'dense' == the
  reference's exact-width BondUpdateLayer), stored in `config_json`.
- `in/...`: one fixed forward batch (perturbed one-hots, positions, t,
  phore features/positions/norms + masks).
- `out/...`: our pred_node / pred_pos / pred_edge / count interval.
- `post/...`: categorical posteriors q(v_{t-1}|v_t, v0_prob) for the atom
  (tomask) and bond (absorb) transitions at t in {1, T/2, T-1}, plus the
  Gaussian posterior mean/std at the same t — replay against
  `models/transition.py:285-315` / `:44-63`.

Replay recipe (torch side): see tests/fixtures/golden/README.md.
Regeneration is deterministic; tests/test_golden_pack.py asserts the
committed pack matches a fresh regeneration bit-for-bit.
"""
from __future__ import annotations

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: sandbox pins axon (TPU); CPU analysis must not race the chip claim
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax

# the pack is a CPU-numerics contract: force the CPU backend regardless of
# the sandbox's default TPU plugin (env var alone is overridden by
# sitecustomize, so set the config explicitly before any backend use)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def tiny_reference_config():
    from phoregen_tpu.config import default_config
    cfg = default_config("zinc_300")
    m = cfg.model
    m.hidden_dim = 16
    m.denoiser.hidden_dim = 16
    m.denoiser.num_layers = 2
    m.denoiser.n_heads = 2
    m.denoiser.knn = 4
    m.denoiser.triplet_mode = "dense"   # reference-exact triplet widths
    m.denoiser.scan_layers = False
    m.diff.num_timesteps = 8
    m.diff.time_dim = 2
    cfg.dataset.ligand_buckets = [8]
    cfg.dataset.max_phore = 8
    cfg.dataset.corpus = "chains"
    cfg.finalize()
    return cfg


def build_pack():
    from phoregen_tpu.constants import NUM_ATOM_CLASSES, NUM_BOND_CLASSES
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.synthetic import synthetic_dataset
    from phoregen_tpu.models.phoregen import PhoreGen
    from test_torch_import import _build_reference_state

    cfg = tiny_reference_config()
    pg = PhoreGen(cfg)
    samples = synthetic_dataset(42, 2, max_atoms=8)
    batch = next(iter(PhoreDataLoader(samples, cfg, 2, shuffle=False)))
    params = pg.init_params(jax.random.PRNGKey(1234), batch)
    host = jax.tree_util.tree_map(np.asarray, params)

    pack = {}
    for k, v in _build_reference_state(host, cfg).items():
        pack[f"ref_state/{k}"] = np.asarray(v, np.float32)

    B, NL = batch.lig_type.shape
    rng = np.random.default_rng(77)
    h_node = rng.normal(size=(B, NL, NUM_ATOM_CLASSES)).astype(np.float32)
    h_edge = rng.normal(
        size=(B, NL, NL, NUM_BOND_CLASSES)).astype(np.float32)
    pos = np.asarray(batch.lig_pos) + 0.05 * rng.normal(
        size=batch.lig_pos.shape).astype(np.float32)
    t = np.asarray([2, 5], np.int32)
    pack.update({
        "in/h_node": h_node, "in/h_edge": h_edge, "in/pos": pos, "in/t": t,
        "in/lig_mask": np.asarray(batch.lig_mask),
        "in/phore_x": np.asarray(batch.phore_x),
        "in/phore_pos": np.asarray(batch.phore_pos),
        "in/phore_norm": np.asarray(batch.phore_norm),
        "in/phore_mask": np.asarray(batch.phore_mask),
    })

    out = pg.net.apply(params, jnp.asarray(h_node), jnp.asarray(pos),
                       batch.lig_mask, jnp.asarray(h_edge), jnp.asarray(t),
                       batch.phore_x, batch.phore_pos, batch.phore_norm,
                       batch.phore_mask)
    pred_node, pred_pos, pred_edge, pred_count = out
    pack["out/pred_node"] = np.asarray(pred_node)
    pack["out/pred_pos"] = np.asarray(pred_pos)
    pack["out/pred_edge"] = np.asarray(pred_edge)
    pack["out/count_lower"] = np.asarray(pred_count[0])
    pack["out/count_upper"] = np.asarray(pred_count[1])

    # categorical + Gaussian posteriors at several timesteps
    T = cfg.model.diff.num_timesteps
    ts = [1, T // 2, T - 1]
    kn = NUM_ATOM_CLASSES
    kb = NUM_BOND_CLASSES
    v0_prob_n = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(B, NL, kn)).astype(np.float32)), -1)
    vt_n = jnp.asarray(rng.integers(0, kn, size=(B, NL)), jnp.int32)
    v0_prob_b = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(B, NL, NL, kb)).astype(np.float32)), -1)
    vt_b = jnp.asarray(rng.integers(0, kb, size=(B, NL, NL)), jnp.int32)
    pack["post/v0_prob_node"] = np.asarray(v0_prob_n)
    pack["post/vt_node"] = np.asarray(vt_n)
    pack["post/v0_prob_bond"] = np.asarray(v0_prob_b)
    pack["post/vt_bond"] = np.asarray(vt_b)
    def log_onehot(idx, k):
        return jnp.log(jnp.clip(jax.nn.one_hot(idx, k), 1e-30, None))

    for tt in ts:
        tv = jnp.full((B,), tt, jnp.int32)
        log_post_n = pg.node_transition.q_v_posterior(
            jnp.log(jnp.clip(v0_prob_n, 1e-30, None)),
            log_onehot(vt_n, kn), tv, v0_prob=True)
        log_post_b = pg.edge_transition.q_v_posterior(
            jnp.log(jnp.clip(v0_prob_b, 1e-30, None)),
            log_onehot(vt_b, kb), tv, v0_prob=True)
        pack[f"post/log_post_node_t{tt}"] = np.asarray(log_post_n)
        pack[f"post/log_post_bond_t{tt}"] = np.asarray(log_post_b)
        # Gaussian posterior coefficients (reference transition.py:44-63)
        gt = pg.pos_transition
        pack[f"post/gauss_coef_x0_t{tt}"] = np.asarray(gt.coef_x0[tt])
        pack[f"post/gauss_coef_xt_t{tt}"] = np.asarray(gt.coef_xt[tt])
        pack[f"post/gauss_std_t{tt}"] = np.asarray(gt.std[tt])

    pack["config_json"] = np.frombuffer(
        json.dumps(cfg.to_dict()).encode(), dtype=np.uint8)
    return pack


def main():
    out_dir = os.path.join(REPO, "tests", "fixtures", "golden")
    os.makedirs(out_dir, exist_ok=True)
    pack = build_pack()
    np.savez_compressed(os.path.join(out_dir, "golden_pack.npz"), **pack)
    print(f"wrote {out_dir}/golden_pack.npz ({len(pack)} arrays)")


if __name__ == "__main__":
    main()
