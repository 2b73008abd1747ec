"""Live (non-pack) end-to-end parity vs the reference across config variants.

The golden pack pins ONE tiny configuration; these tests build additional
configurations on the fly — random weights, random inputs — convert the
param tree to a reference-named state dict (`_build_reference_state`), run
the reference's own PhoreDiff.forward (CPU torch + tests/pyg_shims.py),
and compare every output. Covers the wiring the pack config does not:
the `pre_att` bond head, `x2h_out_fc` node-output MLPs, and the
no-direction-match / no-global-ew / no-phore-encoder paths.

Reference anchors: `models/diffusion.py:175-246` (forward),
`models/uni_denoiser.py:212-298` (attention layer wiring).
"""
import importlib.util
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("PHOREGEN_REFERENCE_PATH", "/root/reference")

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REFERENCE, "models")):
    pytest.skip(f"reference checkout not found at {REFERENCE}",
                allow_module_level=True)

import pyg_shims

ED = pyg_shims.install(REFERENCE)


def _load_replay():
    spec = importlib.util.spec_from_file_location(
        "replay_golden_torch",
        os.path.join(REPO, "scripts", "replay_golden_torch.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tiny_cfg(**mods):
    from phoregen_tpu.config import default_config
    cfg = default_config("zinc_300")
    m = cfg.model
    m.hidden_dim = 16
    m.denoiser.hidden_dim = 16
    m.denoiser.num_layers = 2
    m.denoiser.n_heads = 2
    m.denoiser.knn = 4
    m.denoiser.triplet_mode = "dense"
    m.denoiser.scan_layers = False
    m.diff.num_timesteps = 8
    m.diff.time_dim = 2
    cfg.dataset.ligand_buckets = [8]
    cfg.dataset.max_phore = 8
    cfg.dataset.corpus = "chains"
    for k, v in mods.items():
        obj = m
        parts = k.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], v)
    cfg.finalize()
    return cfg


def _run_variant(seed, **mods):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from phoregen_tpu.constants import NUM_ATOM_CLASSES, NUM_BOND_CLASSES
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.synthetic import synthetic_dataset
    from phoregen_tpu.models.phoregen import PhoreGen
    from test_torch_import import _build_reference_state

    cfg = _tiny_cfg(**mods)
    pg = PhoreGen(cfg)
    samples = synthetic_dataset(42, 2, max_atoms=8)  # known-good tiny set
    batch = next(iter(PhoreDataLoader(samples, cfg, 2, shuffle=False)))
    params = pg.init_params(jax.random.PRNGKey(seed), batch)
    host = jax.tree_util.tree_map(np.asarray, params)

    B, NL = batch.lig_type.shape
    rng = np.random.default_rng(seed + 7)
    pack = {
        "in/h_node": rng.normal(size=(B, NL, NUM_ATOM_CLASSES)
                                ).astype(np.float32),
        "in/h_edge": rng.normal(size=(B, NL, NL, NUM_BOND_CLASSES)
                                ).astype(np.float32),
        "in/pos": (np.asarray(batch.lig_pos)
                   + 0.05 * rng.normal(size=batch.lig_pos.shape)
                   ).astype(np.float32),
        "in/t": np.asarray([1, 6], np.int32),
        "in/lig_mask": np.asarray(batch.lig_mask),
        "in/phore_x": np.asarray(batch.phore_x),
        "in/phore_pos": np.asarray(batch.phore_pos),
        "in/phore_norm": np.asarray(batch.phore_norm),
        "in/phore_mask": np.asarray(batch.phore_mask),
    }
    ours = pg.net.apply(params, jnp.asarray(pack["in/h_node"]),
                        jnp.asarray(pack["in/pos"]), batch.lig_mask,
                        jnp.asarray(pack["in/h_edge"]),
                        jnp.asarray(pack["in/t"]), batch.phore_x,
                        batch.phore_pos, batch.phore_norm, batch.phore_mask)
    pred_node, pred_pos, pred_edge, pred_count = ours

    # reference side
    from models.diffusion import PhoreDiff
    model = PhoreDiff(ED(cfg.to_dict()["model"]), "zinc_300")
    model.eval()
    state = {k: torch.tensor(np.asarray(v))
             for k, v in _build_reference_state(host, cfg).items()}
    missing, unexpected = model.load_state_dict(state, strict=False)
    assert not unexpected, unexpected[:6]
    # deterministic ctor buffers (schedules/posterior tables) are absent
    # from the converted state on purpose
    _buf = (".offset", ".freq_bands", ".betas", ".alphas", ".alphas_bar",
            ".alphas_bar_prev", ".coef_x0", ".coef_xt", ".std",
            ".q_mats", ".transpopse_q_onestep_mats", ".q_one_step_mats",
            ".init_prob", ".Lt_history", ".Lt_count", ".coeff")
    real_missing = [m for m in missing if not m.endswith(_buf)]
    assert not real_missing, real_missing[:6]

    replay = _load_replay()
    inputs, lig_mask, grid_slots = replay.flat_inputs(pack)
    with torch.no_grad():
        ref_v, ref_pos, ref_bond, (cl, cu) = model(**inputs)

    np.testing.assert_allclose(
        np.asarray(ref_v), np.asarray(pred_node)[lig_mask],
        rtol=3e-4, atol=3e-4, err_msg="pred_node")
    np.testing.assert_allclose(
        np.asarray(ref_pos), np.asarray(pred_pos)[lig_mask],
        rtol=3e-4, atol=3e-4, err_msg="pred_pos")
    ours_bond = np.stack([np.asarray(pred_edge)[g, s, d]
                          for (g, s, d) in grid_slots])
    np.testing.assert_allclose(np.asarray(ref_bond), ours_bond,
                               rtol=3e-4, atol=3e-4, err_msg="pred_bond")
    np.testing.assert_allclose(
        np.asarray(cl).reshape(-1), np.asarray(pred_count[0]).reshape(-1),
        rtol=3e-4, atol=3e-4, err_msg="count_lower")
    np.testing.assert_allclose(
        np.asarray(cu).reshape(-1), np.asarray(pred_count[1]).reshape(-1),
        rtol=3e-4, atol=3e-4, err_msg="count_upper")


@pytest.mark.slow
def test_parity_pre_att_x2h_out_fc():
    _run_variant(101, **{"bond_net_type": "pre_att",
                         "denoiser.x2h_out_fc": True})


@pytest.mark.slow
def test_parity_minimal_wiring():
    # NOTE use_global_ew is excluded: the reference's `get_denoiser_net`
    # never forwards it, so the reference ALWAYS builds+applies the global
    # edge weight (`models/uni_denoiser.py:304,325-326`) — False is not a
    # reference-reachable configuration (our knob generalizes it).
    _run_variant(202, **{"denoiser.direction_match": False,
                         "hp_emb_with_pos": False})


@pytest.mark.slow
def test_parity_concat_apply_style():
    """The concat application style (bench default) against the reference."""
    _run_variant(303, **{"denoiser.edge_mlp_apply": "concat"})


@pytest.mark.slow
def test_parity_two_blocks_wider():
    """num_blocks=2 exercises the per-block kNN rebuild with the SHARED
    layer stack (reference reuses `base_block` across blocks,
    `uni_denoiser.py:339-349,419-421`), at a wider head/hidden shape."""
    _run_variant(404, **{"denoiser.num_blocks": 2,
                         "denoiser.n_heads": 4,
                         "hidden_dim": 32,
                         "denoiser.hidden_dim": 32,
                         "denoiser.knn": 6})
