"""Model-level golden-property tests on tiny fixed graphs (SURVEY.md §4):
translation/rotation equivariance of the position head, padding invariance,
and both triplet-layer modes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phoregen_tpu.data.batching import PhoreGraphBatch
from phoregen_tpu.models.phoregen import PhoreGen
from tests.test_train import tiny_config


def make_batch(rng, B=2, NL=8, NP=6, n_lig=6, n_phore=4, fp=18):
    lig_type = rng.integers(0, 11, (B, NL)).astype(np.int32)
    lig_pos = rng.normal(size=(B, NL, 3)).astype(np.float32) * 2
    lig_mask = np.zeros((B, NL), bool)
    lig_mask[:, :n_lig] = True
    lig_type[~lig_mask] = 0
    lig_pos[~lig_mask] = 0
    bond = rng.integers(0, 5, (B, NL, NL)).astype(np.int32)
    eye = np.eye(NL, dtype=bool)
    bond[:, eye] = 0
    pm = lig_mask[:, :, None] & lig_mask[:, None, :]
    bond[~pm] = 0
    phore_x = rng.normal(size=(B, NP, fp)).astype(np.float32)
    phore_pos = rng.normal(size=(B, NP, 3)).astype(np.float32) * 2
    phore_norm = rng.normal(size=(B, NP, 3)).astype(np.float32)
    phore_norm /= np.linalg.norm(phore_norm, axis=-1, keepdims=True)
    phore_mask = np.zeros((B, NP), bool)
    phore_mask[:, :n_phore] = True
    phore_x[~phore_mask] = 0
    phore_pos[~phore_mask] = 0
    phore_norm[~phore_mask] = 0
    return PhoreGraphBatch(
        lig_type=lig_type, lig_pos=lig_pos, lig_mask=lig_mask,
        bond_type=bond, phore_x=phore_x, phore_pos=phore_pos,
        phore_norm=phore_norm, phore_mask=phore_mask,
        center=np.zeros((B, 3), np.float32))


def forward(pg, params, batch, t_val=3):
    mcfg = pg.config.model
    B = batch.num_graphs
    h_node = jax.nn.one_hot(batch.lig_type, mcfg.num_atom_classes)
    h_edge = jax.nn.one_hot(batch.bond_type, mcfg.num_bond_classes)
    t = jnp.full((B,), t_val, jnp.int32)
    return pg.net.apply(params, h_node, batch.lig_pos, batch.lig_mask,
                        h_edge, t, batch.phore_x, batch.phore_pos,
                        batch.phore_norm, batch.phore_mask)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    pg = PhoreGen(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    params = pg.init_params(jax.random.PRNGKey(0), batch)
    fwd = jax.jit(lambda p, b: forward(pg, p, b))
    return pg, params, batch, fwd, rng


def test_translation_equivariance(setup):
    """Shifting phore+ligand positions by v shifts pred_pos by exactly v and
    leaves type/bond/count predictions unchanged (the network only consumes
    relative geometry)."""
    pg, params, batch, fwd, rng = setup
    node0, pos0, edge0, cnt0 = fwd(params, batch)
    v = np.asarray([1.5, -2.0, 0.5], np.float32)
    shifted = PhoreGraphBatch(
        lig_type=batch.lig_type,
        lig_pos=batch.lig_pos + v * np.asarray(batch.lig_mask)[..., None],
        lig_mask=batch.lig_mask, bond_type=batch.bond_type,
        phore_x=batch.phore_x,
        phore_pos=batch.phore_pos + v * np.asarray(
            batch.phore_mask)[..., None],
        phore_norm=batch.phore_norm, phore_mask=batch.phore_mask,
        center=batch.center)
    node1, pos1, edge1, cnt1 = fwd(params, shifted)
    lm = np.asarray(batch.lig_mask)[..., None]
    np.testing.assert_allclose(np.asarray(pos1) * lm,
                               (np.asarray(pos0) + v) * lm,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(node1), np.asarray(node0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(edge1), np.asarray(edge0),
                               rtol=2e-4, atol=2e-4)


def test_rotation_equivariance(setup):
    """Rotating positions AND norm vectors rotates pred_pos; invariant heads
    unchanged (within float tolerance)."""
    pg, params, batch, fwd, rng = setup
    node0, pos0, edge0, _ = fwd(params, batch)
    theta = 0.7
    R = np.asarray([[np.cos(theta), -np.sin(theta), 0],
                    [np.sin(theta), np.cos(theta), 0],
                    [0, 0, 1]], np.float32)
    rot = PhoreGraphBatch(
        lig_type=batch.lig_type,
        lig_pos=np.asarray(batch.lig_pos) @ R.T,
        lig_mask=batch.lig_mask, bond_type=batch.bond_type,
        phore_x=batch.phore_x,
        phore_pos=np.asarray(batch.phore_pos) @ R.T,
        phore_norm=np.asarray(batch.phore_norm) @ R.T,
        phore_mask=batch.phore_mask, center=batch.center)
    node1, pos1, edge1, _ = fwd(params, rot)
    lm = np.asarray(batch.lig_mask)[..., None]
    np.testing.assert_allclose(np.asarray(pos1) * lm,
                               (np.asarray(pos0) @ R.T) * lm,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(node1), np.asarray(node0),
                               rtol=1e-3, atol=1e-3)


def test_padding_invariance(setup):
    """Growing the padded slots (NL 8->12, NP 6->9) must not change any
    prediction on the real slots."""
    pg, params, batch, fwd, rng = setup
    node0, pos0, edge0, cnt0 = fwd(params, batch)

    def grow(arr, axis, size):
        pad = [(0, 0)] * arr.ndim
        pad[axis] = (0, size - arr.shape[axis])
        return np.pad(np.asarray(arr), pad)

    big = PhoreGraphBatch(
        lig_type=grow(batch.lig_type, 1, 12),
        lig_pos=grow(batch.lig_pos, 1, 12),
        lig_mask=grow(batch.lig_mask, 1, 12),
        bond_type=grow(grow(batch.bond_type, 1, 12), 2, 12),
        phore_x=grow(batch.phore_x, 1, 9),
        phore_pos=grow(batch.phore_pos, 1, 9),
        phore_norm=grow(batch.phore_norm, 1, 9),
        phore_mask=grow(batch.phore_mask, 1, 9),
        center=batch.center)
    node1, pos1, edge1, cnt1 = fwd(params, big)
    np.testing.assert_allclose(np.asarray(node1)[:, :8], np.asarray(node0),
                               rtol=2e-4, atol=2e-4)
    lm = np.asarray(batch.lig_mask)[..., None]
    np.testing.assert_allclose(np.asarray(pos1)[:, :8] * lm,
                               np.asarray(pos0) * lm, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(edge1)[:, :8, :8],
                               np.asarray(edge0), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cnt1[0]), np.asarray(cnt0[0]),
                               rtol=2e-4, atol=2e-4)


def test_triplet_dense_mode_runs():
    """The exact-width 'dense' triplet mode compiles and produces finite
    outputs of the same shapes as 'factorized'."""
    cfg = tiny_config()
    cfg.model.denoiser.triplet_mode = "dense"
    pg = PhoreGen(cfg)
    rng = np.random.default_rng(1)
    batch = make_batch(rng)
    params = pg.init_params(jax.random.PRNGKey(0), batch)
    node, pos, edge, cnt = jax.jit(
        lambda p, b: forward(pg, p, b))(params, batch)
    assert np.isfinite(np.asarray(node)).all()
    assert np.isfinite(np.asarray(pos)).all()
    assert np.isfinite(np.asarray(edge)).all()
    assert node.shape == (2, 8, 12) and edge.shape == (2, 8, 8, 6)


@pytest.mark.slow
def test_knn_pool_dtype_follow():
    """triplet_pool_follow_dtype: f32 compute is bit-identical regardless of
    the flag; bf16 compute with the pool following tracks the f32-pool
    result to bf16 tolerance (the softmax stays f32)."""
    import copy
    rng = np.random.default_rng(3)
    batch = make_batch(rng)

    def run(compute_dtype, follow):
        cfg = tiny_config()
        cfg.model.denoiser.triplet_knn = 3
        cfg.model.compute_dtype = compute_dtype
        cfg.model.denoiser.triplet_pool_follow_dtype = follow
        pg = PhoreGen(cfg)
        params = pg.init_params(jax.random.PRNGKey(0), batch)
        node, pos, edge, cnt = jax.jit(
            lambda p, b: forward(pg, p, b))(params, batch)
        return (np.asarray(node, np.float32), np.asarray(pos, np.float32),
                np.asarray(edge, np.float32))

    f32_off = run("float32", False)
    f32_on = run("float32", True)
    for a, b in zip(f32_off, f32_on):
        np.testing.assert_array_equal(a, b)  # no effect at f32

    bf_off = run("bfloat16", False)
    bf_on = run("bfloat16", True)
    for a, b in zip(bf_off, bf_on):
        assert np.isfinite(b).all()
        denom = np.maximum(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() / denom < 0.1


def test_pre_att_bond_head_runs():
    """bond_net_type='pre_att' (distance RBF + mean endpoint features)
    compiles and produces finite logits of the same shapes as 'lin'
    (reference `models/diffusion.py:61-77,225-241`)."""
    cfg = tiny_config()
    cfg.model.bond_net_type = "pre_att"
    pg = PhoreGen(cfg)
    rng = np.random.default_rng(4)
    batch = make_batch(rng)
    params = pg.init_params(jax.random.PRNGKey(0), batch)
    node, pos, edge, cnt = jax.jit(
        lambda p, b: forward(pg, p, b))(params, batch)
    assert edge.shape == (2, 8, 8, 6)
    assert np.isfinite(np.asarray(edge)).all()
    # and the training loss closes over it
    loss, metrics = jax.jit(
        lambda p, k, b: pg.compute_loss(p, k, b))(
            params, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(loss))


def test_alternative_flag_branches_run():
    """Flip the optional architecture switches off/on relative to their
    defaults (phore self-encoder off, global edge weight off, direction
    match off, x2h out FC on, bond-length loss on) — every branch must
    compile and produce a finite loss."""
    cfg = tiny_config()
    m = cfg.model
    m.hp_emb_with_pos = False
    m.bond_len_loss = True
    d = m.denoiser
    d.use_global_ew = False
    d.direction_match = False
    d.x2h_out_fc = True
    pg = PhoreGen(cfg)
    rng = np.random.default_rng(6)
    batch = make_batch(rng)
    params = pg.init_params(jax.random.PRNGKey(0), batch)
    loss, metrics = jax.jit(
        lambda p, k, b: pg.compute_loss(p, k, b))(
            params, jax.random.PRNGKey(2), batch)
    assert np.isfinite(float(loss))
    assert "loss_len" in metrics and np.isfinite(float(metrics["loss_len"]))


def test_radius_cutoff_mode_runs():
    """cutoff_mode='radius' builds a k-capped radius graph (reference
    `_connect_edge` radius branch) instead of being silently ignored."""
    cfg = tiny_config()
    cfg.model.denoiser.cutoff_mode = "radius"
    cfg.model.denoiser.r_max = 6.0
    pg = PhoreGen(cfg)
    rng = np.random.default_rng(8)
    batch = make_batch(rng)
    params = pg.init_params(jax.random.PRNGKey(0), batch)
    node, pos, edge, cnt = jax.jit(
        lambda p, b: forward(pg, p, b))(params, batch)
    assert np.isfinite(np.asarray(node)).all()
    # unsupported modes fail loudly at finalize
    cfg2 = tiny_config()
    cfg2.model.denoiser.cutoff_mode = "bogus_mode"
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        cfg2.finalize()
