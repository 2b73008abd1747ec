"""Fused whole-layer-stack parity (ops/layer_stack.py).

The fused stack (packed weights, one-hot-matmul gathers) must reproduce the
standard flax layer path bit-for-bit up to fp reassociation. Oracle: the
standard path with `block_knn_freeze=True` (identical frozen-index
semantics by construction — see layer_stack.py docstring)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phoregen_tpu.config import default_config
from phoregen_tpu.data.loader import PhoreDataLoader
from phoregen_tpu.data.synthetic import synthetic_dataset
from phoregen_tpu.models.phoregen import PhoreGen


def _setup(fused: str, freeze: bool, heads=2, H=16, layers=3, knn=4,
           trip_k=3):
    cfg = default_config("zinc_300")
    m = cfg.model
    m.hidden_dim = H
    m.denoiser.hidden_dim = H
    m.denoiser.num_layers = layers
    m.denoiser.n_heads = heads
    m.denoiser.knn = knn
    m.denoiser.triplet_knn = trip_k
    m.denoiser.triplet_width = 8
    m.denoiser.scan_layers = True
    m.denoiser.block_knn_freeze = freeze
    m.denoiser.fused_stack = fused
    m.diff.num_timesteps = 8
    m.diff.time_dim = 2
    cfg.dataset.ligand_buckets = [16]
    cfg.dataset.max_phore = 16
    cfg.dataset.corpus = "chains"
    cfg.finalize()
    return cfg


@pytest.fixture(scope="module")
def batch_and_key():
    cfg = _setup("none", False)
    samples = synthetic_dataset(0, 3, max_atoms=12)
    batch = next(iter(PhoreDataLoader(samples, cfg, 3, shuffle=False)))
    return batch, jax.random.PRNGKey(7)


def _forward(cfg, batch, key, params=None):
    pg = PhoreGen(cfg)
    if params is None:
        params = pg.init_params(jax.random.PRNGKey(0), batch)
    # drive through compute_loss with zero noise-randomness influence:
    # use the deterministic full forward via the net on a fixed perturbation
    from phoregen_tpu.constants import NUM_ATOM_CLASSES, NUM_BOND_CLASSES
    B, NL = batch.lig_type.shape
    rng = np.random.default_rng(5)
    h_node = jnp.asarray(rng.normal(size=(B, NL, NUM_ATOM_CLASSES)),
                         jnp.float32)
    h_edge = jnp.asarray(
        rng.normal(size=(B, NL, NL, NUM_BOND_CLASSES)), jnp.float32)
    pos = batch.lig_pos + 0.1 * jnp.asarray(
        rng.normal(size=batch.lig_pos.shape), jnp.float32)
    t = jnp.asarray(rng.integers(0, 8, size=(B,)), jnp.int32)
    out = pg.net.apply(params, h_node, pos, batch.lig_mask, h_edge, t,
                       batch.phore_x, batch.phore_pos, batch.phore_norm,
                       batch.phore_mask)
    return params, out


@pytest.mark.slow
def test_fused_xla_matches_frozen_oracle(batch_and_key):
    batch, key = batch_and_key
    cfg_oracle = _setup("none", freeze=True)
    params, out_oracle = _forward(cfg_oracle, batch, key)
    cfg_fused = _setup("xla", freeze=False)
    _, out_fused = _forward(cfg_fused, batch, key, params=params)
    names = ["pred_node", "pred_pos", "pred_edge", "pred_count"]
    for name, a, b in zip(names, out_oracle, out_fused):
        if a is None:
            assert b is None
            continue
        if isinstance(a, tuple):
            for x, y in zip(a, b):
                np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                           rtol=2e-4, atol=2e-4,
                                           err_msg=name)
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4, err_msg=name)


def test_fused_xla2_trip_k_at_bucket_width(batch_and_key):
    """Regression: triplet_knn >= NL (knn32 flagship sampling into the
    NL=32 bucket). knn_neighbors clamps k to NL-1, so the fused tables
    must clamp the same way instead of desyncing the reshape widths."""
    batch, key = batch_and_key
    cfg_oracle = _setup("none", freeze=True, trip_k=16)  # NL = bucket = 16
    params, out_oracle = _forward(cfg_oracle, batch, key)
    cfg_fused = _setup("xla2", freeze=False, trip_k=16)
    _, out_fused = _forward(cfg_fused, batch, key, params=params)
    np.testing.assert_allclose(np.asarray(out_oracle[1]),
                               np.asarray(out_fused[1]),
                               rtol=2e-4, atol=2e-4)


def test_frozen_oracle_differs_only_slightly_from_exact(batch_and_key):
    """block_knn_freeze changes only which neighbour SETS feed dire/triplet;
    on one forward the drift must be small relative to activations."""
    batch, key = batch_and_key
    cfg_a = _setup("none", freeze=False)
    params, out_a = _forward(cfg_a, batch, key)
    cfg_b = _setup("none", freeze=True)
    _, out_b = _forward(cfg_b, batch, key, params=params)
    a = np.asarray(out_a[1])
    b = np.asarray(out_b[1])
    # same order of magnitude, not wildly different
    denom = max(np.abs(a).max(), 1e-6)
    assert np.abs(a - b).max() / denom < 0.5


def test_fused_requires_flagship_config(batch_and_key):
    batch, key = batch_and_key
    cfg = _setup("xla", freeze=False)
    cfg.model.denoiser.direction_match = False
    with pytest.raises(ValueError, match="flagship"):
        _forward(cfg, batch, key)


@pytest.mark.slow
def test_pallas_interpret_matches_xla(batch_and_key):
    """The Pallas kernel (interpret mode on CPU) vs the packed XLA driver."""
    pytest.importorskip("jax.experimental.pallas")
    from phoregen_tpu.ops import layer_stack as ls
    if not hasattr(ls, "layer_stack_pallas"):
        pytest.skip("pallas layer-stack not built yet")
    batch, key = batch_and_key
    cfg = _setup("xla", freeze=False)
    params, out_xla = _forward(cfg, batch, key)
    ls._FORCE_INTERPRET = True
    try:
        cfg_p = _setup("pallas", freeze=False)
        _, out_pal = _forward(cfg_p, batch, key, params=params)
    finally:
        ls._FORCE_INTERPRET = False
    for name, a, b in zip(["node", "pos", "edge"], out_xla, out_pal):
        if a is None or isinstance(a, tuple):
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-4, err_msg=name)


@pytest.mark.slow
def test_pallas3_interpret_matches_xla(batch_and_key):
    """The merged node+PRE stage (fused_stack 'pallas3', 3 dispatches per
    layer) vs the packed XLA driver — interpret mode on CPU."""
    pytest.importorskip("jax.experimental.pallas")
    from phoregen_tpu.ops import layer_stack as ls
    batch, key = batch_and_key
    cfg = _setup("xla", freeze=False)
    params, out_xla = _forward(cfg, batch, key)
    ls._FORCE_INTERPRET = True
    try:
        cfg_p = _setup("pallas3", freeze=False)
        _, out_pal = _forward(cfg_p, batch, key, params=params)
    finally:
        ls._FORCE_INTERPRET = False
    for name, a, b in zip(["node", "pos", "edge"], out_xla, out_pal):
        if a is None or isinstance(a, tuple):
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-4, err_msg=name)


@pytest.mark.slow
def test_pallas2_interpret_matches_xla(batch_and_key):
    """The fully-merged 2-dispatch layer (fused_stack 'pallas2': node+PRE
    merged AND pos folded into the attention kernel's last head step) vs
    the packed XLA driver — interpret mode on CPU."""
    pytest.importorskip("jax.experimental.pallas")
    from phoregen_tpu.ops import layer_stack as ls
    batch, key = batch_and_key
    cfg = _setup("xla", freeze=False)
    params, out_xla = _forward(cfg, batch, key)
    ls._FORCE_INTERPRET = True
    try:
        cfg_p = _setup("pallas2", freeze=False)
        _, out_pal = _forward(cfg_p, batch, key, params=params)
    finally:
        ls._FORCE_INTERPRET = False
    for name, a, b in zip(["node", "pos", "edge"], out_xla, out_pal):
        if a is None or isinstance(a, tuple):
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                   atol=5e-4, err_msg=name)


@pytest.mark.slow
def test_fused_stack_inside_sampler_scan(batch_and_key):
    """End-to-end: the fused paths run inside the jitted reverse scan and
    match the standard path through 6 full reverse steps (~1e-5)."""
    import numpy as np
    from phoregen_tpu.sample.sampler import Sampler
    from phoregen_tpu.ops import layer_stack as ls

    def run(mode, params=None):
        cfg = _setup(mode, freeze=(mode == "none"))
        cfg.model.diff.num_timesteps = 6
        pg = PhoreGen(cfg)
        batch, _ = batch_and_key
        if params is None:
            params = pg.init_params(jax.random.PRNGKey(0), batch)
        s = Sampler(pg)
        out = jax.jit(lambda p, k, b: s.sample(p, k, b))(
            params, jax.random.PRNGKey(5), batch)
        return params, np.asarray(out["pred_pos"])

    params, pos_none = run("none")
    _, pos_xla = run("xla", params)
    np.testing.assert_allclose(pos_none, pos_xla, rtol=1e-3, atol=1e-4)
    ls._FORCE_INTERPRET = True
    try:
        _, pos_pal = run("pallas", params)
    finally:
        ls._FORCE_INTERPRET = False
    np.testing.assert_allclose(pos_xla, pos_pal, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_pallas_bf16_blocks_close_to_f32(batch_and_key):
    """fused_block_dtype=bfloat16 (PRE->ATT inter-stage blocks in bf16,
    in-kernel math f32) vs the f32 fused path — bf16-scale tolerance."""
    pytest.importorskip("jax.experimental.pallas")
    from phoregen_tpu.ops import layer_stack as ls
    batch, key = batch_and_key
    cfg = _setup("pallas2", freeze=False)
    ls._FORCE_INTERPRET = True
    try:
        params, out_f32 = _forward(cfg, batch, key)
        cfg_b = _setup("pallas2", freeze=False)
        cfg_b.model.denoiser.fused_block_dtype = "bfloat16"
        _, out_bf = _forward(cfg_b, batch, key, params=params)
    finally:
        ls._FORCE_INTERPRET = False
    for name, a, b in zip(["node", "pos", "edge"], out_f32, out_bf):
        if a is None or isinstance(a, tuple):
            continue
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() / scale < 0.03, name


@pytest.mark.slow
def test_fused_stack_grad_matches_xla(batch_and_key):
    """The fused Pallas stack works under jax.grad (training): the custom
    VJP (ops/layer_stack.py make_layer_stack_grad — Pallas forward, XLA
    packed-path backward) must reproduce the fused_stack='xla' loss AND
    parameter gradients. Reference training hot path being enabled:
    /root/reference/run/run.py:106-156 through the fused stack."""
    from phoregen_tpu.ops import layer_stack as ls
    batch, key = batch_and_key

    def loss_and_grad(mode, params=None):
        cfg = _setup(mode, freeze=(mode == "none"))
        pg = PhoreGen(cfg)
        if params is None:
            params = pg.init_params(jax.random.PRNGKey(0), batch)

        def f(p):
            loss, _ = pg.compute_loss(p, jax.random.PRNGKey(11), batch)
            return loss

        val, grad = jax.value_and_grad(f)(params)
        return params, float(val), grad

    params, val_x, grad_x = loss_and_grad("xla")
    ls._FORCE_INTERPRET = True
    try:
        _, val_p, grad_p = loss_and_grad("pallas3", params)
    finally:
        ls._FORCE_INTERPRET = False
    assert abs(val_x - val_p) / max(abs(val_x), 1e-6) < 1e-3
    fx = jax.tree_util.tree_leaves_with_path(grad_x)
    fp = jax.tree_util.tree_leaves(grad_p)
    assert len(fx) == len(fp)
    worst = []
    for (path, gx), gp in zip(fx, fp):
        gx, gp = np.asarray(gx), np.asarray(gp)
        scale = max(np.abs(gx).max(), 1e-3)
        rel = np.abs(gx - gp).max() / scale
        worst.append((rel, jax.tree_util.keystr(path), scale))
    worst.sort(reverse=True)
    # the pallas-interpret primal differs from the XLA primal at ~5e-4
    # (forward parity tolerance); softmax/KL losses amplify that into the
    # cotangents, so per-leaf grad agreement bottoms out near 1e-3
    assert worst[0][0] < 5e-3, worst[:5]


def test_xla2_matches_xla(batch_and_key):
    """The batched-einsum driver (fused_stack 'xla2', layer_stack_xla2)
    reproduces the vmapped per-graph driver. Only numeric divergence:
    jnp.arctan2 here vs the Mosaic atan2 polynomial (~1e-5 rad) in the
    per-graph path, amplified through the layer stack."""
    batch, key = batch_and_key
    cfg_a = _setup("xla", freeze=False)
    params, out_a = _forward(cfg_a, batch, key)
    cfg_b = _setup("xla2", freeze=False)
    _, out_b = _forward(cfg_b, batch, key, params=params)
    names = ["pred_node", "pred_pos", "pred_edge", "pred_count"]
    for name, a, b in zip(names, out_a, out_b):
        if a is None:
            assert b is None
            continue
        if isinstance(a, tuple):
            for x, y in zip(a, b):
                np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                           rtol=3e-4, atol=3e-4,
                                           err_msg=name)
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4,
                                   atol=3e-4, err_msg=name)


def test_xla2_grad_matches_xla(batch_and_key):
    """'xla2' is plain differentiable jnp — training through it must match
    the 'xla' trainer's loss and parameter gradients."""
    batch, key = batch_and_key

    def loss_and_grad(mode, params=None):
        cfg = _setup(mode, freeze=False)
        pg = PhoreGen(cfg)
        if params is None:
            params = pg.init_params(jax.random.PRNGKey(0), batch)

        def f(p):
            loss, _ = pg.compute_loss(p, jax.random.PRNGKey(11), batch)
            return loss

        val, grad = jax.value_and_grad(f)(params)
        return params, float(val), grad

    params, val_x, grad_x = loss_and_grad("xla")
    _, val_b, grad_b = loss_and_grad("xla2", params)
    assert abs(val_x - val_b) / max(abs(val_x), 1e-6) < 1e-3
    fx = jax.tree_util.tree_leaves_with_path(grad_x)
    fb = jax.tree_util.tree_leaves(grad_b)
    assert len(fx) == len(fb)
    worst = []
    for (path, gx), gb in zip(fx, fb):
        gx, gb = np.asarray(gx), np.asarray(gb)
        scale = max(np.abs(gx).max(), 1e-3)
        rel = np.abs(gx - gb).max() / scale
        worst.append((rel, jax.tree_util.keystr(path), scale))
    worst.sort(reverse=True)
    assert worst[0][0] < 5e-3, worst[:5]


def test_xla2_bf16_close_to_f32(batch_and_key):
    """fused_stack='xla2' with fused_block_dtype=bfloat16 (bf16 carries/
    matmuls, f32 geometry+softmax) vs the f32 xla2 path — bf16-scale
    tolerance."""
    batch, key = batch_and_key
    cfg_a = _setup("xla2", freeze=False)
    params, out_a = _forward(cfg_a, batch, key)
    cfg_b = _setup("xla2", freeze=False)
    cfg_b.model.denoiser.fused_block_dtype = "bfloat16"
    _, out_b = _forward(cfg_b, batch, key, params=params)
    names = ["pred_node", "pred_pos", "pred_edge", "pred_count"]
    for name, a, b in zip(names, out_a, out_b):
        if a is None:
            assert b is None
            continue
        if isinstance(a, tuple):
            for x, y in zip(a, b):
                np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                           rtol=0.08, atol=0.08,
                                           err_msg=name)
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0.08,
                                   atol=0.08, err_msg=name)


def test_xla2_grad_finite_padded(batch_and_key):
    """JITTED params-only training grads through the fused stacks must be
    finite on a batch WITH padded lanes (graphs smaller than the bucket).

    Round-5 regression: `_softmax_masked`'s denominator floor of 1e-30 made
    the division VJP form 1/denom^2 = 1e60 = inf(f32) on fully-masked rows
    (padded nodes / empty triplet sets); inf * (e = 0) = NaN, poisoning
    every upstream weight gradient — jit-compiled training through
    fused_stack xla/xla2 produced NaN grads at step 0 (TRAIN_SWEEP_r05's
    loss_finite=false rows) while the eager grad-parity test happened to
    pass. The floor is now 1.0, exact for any row with a valid lane."""
    batch, key = batch_and_key
    cfg = _setup("xla2", freeze=False)
    pg = PhoreGen(cfg)
    params = pg.init_params(jax.random.PRNGKey(0), batch)

    def f(p):
        loss, _ = pg.compute_loss(p, jax.random.PRNGKey(11), batch)
        return loss

    val, grad = jax.jit(jax.value_and_grad(f))(params)
    assert np.isfinite(float(val))
    bad = [jax.tree_util.keystr(k) for k, g in
           jax.tree_util.tree_flatten_with_path(grad)[0]
           if not np.all(np.isfinite(np.asarray(g)))]
    assert not bad, f"non-finite grads in {len(bad)} leaves: {bad[:8]}"
