"""Parity tests for the fused (split-linear) attention layers.

The production modules in `models/layers.py` apply the first linear layer of
each edge-grid MLP as split matmuls (edge-term on the grid + node-terms on
the node axis, broadcast/gathered) and pair the k/v projections into one
matmul — instead of materializing `concat([edge_feat, h_i, h_j])` on the
[B,N,K]/[B,N,N] grids (VERDICT round-2 perf item: loop-body op content is
the measured sampling-cost lever).

These tests pin the algebra: the golden implementations below are verbatim
snapshots of the pre-fusion modules (concat + whole-kernel MLinear); both
are evaluated with the SAME parameter tree (the fused modules keep MLP's
{Dense_0, LayerNorm_0, Dense_1} layout exactly) and must agree to fp32
tolerance. Reference math: `NodeUpdateLayer`/`PosUpdateLayer`
(reference `models/uni_denoiser.py:13-72,168-209`).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from phoregen_tpu.models.layers import (MLP, NodeUpdateDense, NodeUpdateKNN,
                                        PosUpdateDense, PosUpdateKNN,
                                        gather_nodes)
from phoregen_tpu.ops.masked import masked_softmax


# ---------------------------------------------------------------------------
# golden (pre-fusion) implementations — concat + full-kernel MLPs
# ---------------------------------------------------------------------------

class GoldenNodeUpdateKNN(nn.Module):
    hidden_dim: int
    n_heads: int
    norm: bool = True
    act_fn: str = "relu"
    out_fc: bool = False

    @nn.compact
    def __call__(self, h, edge_feat, nbr_idx, nbr_mask, e_w=None):
        B, N, H = h.shape
        K = nbr_idx.shape[-1]
        d_head = self.hidden_dim // self.n_heads
        hj = gather_nodes(h, nbr_idx)
        hi = jnp.broadcast_to(h[:, :, None, :], hj.shape)
        kv_input = jnp.concatenate([edge_feat, hi, hj], axis=-1)
        k = MLP(self.hidden_dim, self.hidden_dim, norm=self.norm,
                act_fn=self.act_fn, name="hk")(kv_input)
        v = MLP(self.hidden_dim, self.hidden_dim, norm=self.norm,
                act_fn=self.act_fn, name="hv")(kv_input)
        if e_w is not None:
            v = v * e_w[..., None]
        q = MLP(self.hidden_dim, self.hidden_dim, norm=self.norm,
                act_fn=self.act_fn, name="hq")(h)
        k = k.reshape(B, N, K, self.n_heads, d_head)
        v = v.reshape(B, N, K, self.n_heads, d_head)
        q = q.reshape(B, N, 1, self.n_heads, d_head)
        scores = jnp.sum(q * k, axis=-1) / float(np.sqrt(d_head))
        alpha = masked_softmax(scores, nbr_mask[..., None], axis=2)
        out = jnp.sum(alpha[..., None] * v, axis=2)
        out = out.reshape(B, N, self.hidden_dim)
        if self.out_fc:
            out = MLP(self.hidden_dim, self.hidden_dim, norm=self.norm,
                      act_fn=self.act_fn, name="node_output")(
                jnp.concatenate([out, h], axis=-1))
        return out


class GoldenNodeUpdateDense(nn.Module):
    hidden_dim: int
    n_heads: int
    norm: bool = True
    act_fn: str = "relu"
    out_fc: bool = False

    @nn.compact
    def __call__(self, h, edge_feat, pair_mask, e_w=None):
        B, N, H = h.shape
        d_head = self.hidden_dim // self.n_heads
        hi = jnp.broadcast_to(h[:, None, :, :], (B, N, N, H))
        hj = jnp.broadcast_to(h[:, :, None, :], (B, N, N, H))
        kv_input = jnp.concatenate([edge_feat, hi, hj], axis=-1)
        k = MLP(self.hidden_dim, self.hidden_dim, norm=self.norm,
                act_fn=self.act_fn, name="hk")(kv_input)
        v = MLP(self.hidden_dim, self.hidden_dim, norm=self.norm,
                act_fn=self.act_fn, name="hv")(kv_input)
        if e_w is not None:
            v = v * e_w[..., None]
        q = MLP(self.hidden_dim, self.hidden_dim, norm=self.norm,
                act_fn=self.act_fn, name="hq")(h)
        k = k.reshape(B, N, N, self.n_heads, d_head)
        v = v.reshape(B, N, N, self.n_heads, d_head)
        q = q.reshape(B, 1, N, self.n_heads, d_head)
        scores = jnp.sum(q * k, axis=-1) / float(np.sqrt(d_head))
        alpha = masked_softmax(scores, pair_mask[..., None], axis=1)
        out = jnp.sum(alpha[..., None] * v, axis=1)
        out = out.reshape(B, N, self.hidden_dim)
        if self.out_fc:
            out = MLP(self.hidden_dim, self.hidden_dim, norm=self.norm,
                      act_fn=self.act_fn, name="node_output")(
                jnp.concatenate([out, h], axis=-1))
        return out


class GoldenPosUpdateKNN(nn.Module):
    hidden_dim: int
    n_heads: int
    norm: bool = True
    act_fn: str = "relu"

    @nn.compact
    def __call__(self, h, rel_x, edge_feat, nbr_idx, nbr_mask, e_w=None):
        B, N, H = h.shape
        K = nbr_idx.shape[-1]
        d_head = self.hidden_dim // self.n_heads
        hj = gather_nodes(h, nbr_idx)
        hi = jnp.broadcast_to(h[:, :, None, :], hj.shape)
        kv_input = jnp.concatenate([edge_feat, hi, hj], axis=-1)
        k = MLP(self.hidden_dim, self.hidden_dim, norm=self.norm,
                act_fn=self.act_fn, name="xk")(kv_input)
        v = MLP(self.n_heads, self.hidden_dim, norm=self.norm,
                act_fn=self.act_fn, name="xv")(kv_input)
        if e_w is not None:
            v = v * e_w[..., None]
        v = v[..., None] * rel_x[:, :, :, None, :]
        q = MLP(self.hidden_dim, self.hidden_dim, norm=self.norm,
                act_fn=self.act_fn, name="xq")(h)
        k = k.reshape(B, N, K, self.n_heads, d_head)
        q = q.reshape(B, N, 1, self.n_heads, d_head)
        scores = jnp.sum(q * k, axis=-1) / float(np.sqrt(d_head))
        alpha = masked_softmax(scores, nbr_mask[..., None], axis=2)
        out = jnp.sum(alpha[..., None] * v, axis=2)
        return jnp.mean(out, axis=2)


class GoldenPosUpdateDense(nn.Module):
    hidden_dim: int
    n_heads: int
    norm: bool = True
    act_fn: str = "relu"

    @nn.compact
    def __call__(self, h, rel_x, edge_feat, pair_mask, e_w=None):
        B, N, H = h.shape
        d_head = self.hidden_dim // self.n_heads
        hi = jnp.broadcast_to(h[:, None, :, :], (B, N, N, H))
        hj = jnp.broadcast_to(h[:, :, None, :], (B, N, N, H))
        kv_input = jnp.concatenate([edge_feat, hi, hj], axis=-1)
        k = MLP(self.hidden_dim, self.hidden_dim, norm=self.norm,
                act_fn=self.act_fn, name="xk")(kv_input)
        v = MLP(self.n_heads, self.hidden_dim, norm=self.norm,
                act_fn=self.act_fn, name="xv")(kv_input)
        if e_w is not None:
            v = v * e_w[..., None]
        v = v[..., None] * rel_x[:, :, :, None, :]
        q = MLP(self.hidden_dim, self.hidden_dim, norm=self.norm,
                act_fn=self.act_fn, name="xq")(h)
        k = k.reshape(B, N, N, self.n_heads, d_head)
        q = q.reshape(B, 1, N, self.n_heads, d_head)
        scores = jnp.sum(q * k, axis=-1) / float(np.sqrt(d_head))
        alpha = masked_softmax(scores, pair_mask[..., None], axis=1)
        out = jnp.sum(alpha[..., None] * v, axis=1)
        return jnp.mean(out, axis=2)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

B, N, K, H, HEADS, FE = 2, 10, 4, 32, 4, 13


def _knn_inputs(seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    edge_feat = jnp.asarray(rng.normal(size=(B, N, K, FE)), jnp.float32)
    nbr_idx = jnp.asarray(rng.integers(0, N, size=(B, N, K)))
    nbr_mask = jnp.asarray(rng.random((B, N, K)) > 0.2)
    e_w = jnp.asarray(rng.random((B, N, K)), jnp.float32)
    rel_x = jnp.asarray(rng.normal(size=(B, N, K, 3)), jnp.float32)
    return h, edge_feat, nbr_idx, nbr_mask, e_w, rel_x


def _dense_inputs(seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    edge_feat = jnp.asarray(rng.normal(size=(B, N, N, FE)), jnp.float32)
    pair_mask = jnp.asarray(rng.random((B, N, N)) > 0.3)
    e_w = jnp.asarray(rng.random((B, N, N)), jnp.float32)
    rel_x = jnp.asarray(rng.normal(size=(B, N, N, 3)), jnp.float32)
    return h, edge_feat, pair_mask, e_w, rel_x


def _check(golden_cls, fused_cls, args, kwargs_list, **mod_kw):
    for kw in kwargs_list:
        fused = fused_cls(hidden_dim=H, n_heads=HEADS, **mod_kw)
        golden = golden_cls(hidden_dim=H, n_heads=HEADS, **mod_kw)
        params = fused.init(jax.random.PRNGKey(0), *args, **kw)
        # identical param trees: golden must accept the fused params as-is
        out_f = fused.apply(params, *args, **kw)
        out_g = golden.apply(params, *args, **kw)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_g),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("out_fc", [False, True])
def test_node_update_knn_parity(out_fc):
    h, ef, idx, mask, e_w, _ = _knn_inputs()
    _check(GoldenNodeUpdateKNN, NodeUpdateKNN, (h, ef, idx, mask),
           [dict(), dict(e_w=e_w)], out_fc=out_fc)


@pytest.mark.parametrize("out_fc", [False, True])
def test_node_update_dense_parity(out_fc):
    h, ef, pm, e_w, _ = _dense_inputs()
    _check(GoldenNodeUpdateDense, NodeUpdateDense, (h, ef, pm),
           [dict(), dict(e_w=e_w)], out_fc=out_fc)


def test_pos_update_knn_parity():
    h, ef, idx, mask, e_w, rel_x = _knn_inputs()
    _check(GoldenPosUpdateKNN, PosUpdateKNN, (h, rel_x, ef, idx, mask),
           [dict(), dict(e_w=e_w)])


def test_pos_update_dense_parity():
    h, ef, pm, e_w, rel_x = _dense_inputs()
    _check(GoldenPosUpdateDense, PosUpdateDense, (h, rel_x, ef, pm),
           [dict(), dict(e_w=e_w)])


def test_no_norm_variant():
    h, ef, idx, mask, e_w, _ = _knn_inputs(3)
    _check(GoldenNodeUpdateKNN, NodeUpdateKNN, (h, ef, idx, mask),
           [dict(e_w=e_w)], norm=False)


def test_gradients_match():
    """Backward parity (the train step differentiates through these)."""
    h, ef, idx, mask, e_w, _ = _knn_inputs(7)
    fused = NodeUpdateKNN(hidden_dim=H, n_heads=HEADS)
    golden = GoldenNodeUpdateKNN(hidden_dim=H, n_heads=HEADS)
    params = fused.init(jax.random.PRNGKey(1), h, ef, idx, mask, e_w=e_w)

    def loss(mod, p):
        return jnp.sum(mod.apply(p, h, ef, idx, mask, e_w=e_w) ** 2)

    gf = jax.grad(lambda p: loss(fused, p))(params)
    gg = jax.grad(lambda p: loss(golden, p))(params)
    flat_f = jax.tree_util.tree_leaves(gf)
    flat_g = jax.tree_util.tree_leaves(gg)
    for a, b in zip(flat_f, flat_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


# ---------------------------------------------------------------------------
# `apply_style="concat"` — the whole-MLP application style is selectable at
# trace time (config `denoiser.edge_mlp_apply`) with the identical parameter
# tree; both styles must agree on every module and through a full denoiser
# forward (which also covers the BondUpdateTriplet tf_kj/tf_q sites).
# ---------------------------------------------------------------------------

def _check_styles(cls, args, kw=(), **mod_kw):
    split = cls(hidden_dim=H, n_heads=HEADS, apply_style="split", **mod_kw)
    concat = cls(hidden_dim=H, n_heads=HEADS, apply_style="concat", **mod_kw)
    kw = dict(kw)
    params = split.init(jax.random.PRNGKey(0), *args, **kw)
    out_s = split.apply(params, *args, **kw)
    out_c = concat.apply(params, *args, **kw)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_c),
                               rtol=2e-5, atol=2e-5)


def test_apply_style_node_knn():
    h, ef, idx, mask, e_w, _ = _knn_inputs(11)
    _check_styles(NodeUpdateKNN, (h, ef, idx, mask), dict(e_w=e_w))


def test_apply_style_node_dense():
    h, ef, pm, e_w, _ = _dense_inputs(11)
    _check_styles(NodeUpdateDense, (h, ef, pm), dict(e_w=e_w))


def test_apply_style_pos_knn():
    h, ef, idx, mask, e_w, rel_x = _knn_inputs(12)
    _check_styles(PosUpdateKNN, (h, rel_x, ef, idx, mask), dict(e_w=e_w))


def test_apply_style_pos_dense():
    h, ef, pm, e_w, rel_x = _dense_inputs(12)
    _check_styles(PosUpdateDense, (h, rel_x, ef, pm), dict(e_w=e_w))


@pytest.mark.slow
def test_apply_style_denoiser_forward():
    """End-to-end: a UniDenoiser forward (covers the triplet tf_kj/tf_q
    split sites, both with and without the kNN source restriction)."""
    from phoregen_tpu.models.denoiser import UniDenoiser

    rng = np.random.default_rng(21)
    B2, NP, NL = 2, 3, 6
    N2 = NP + NL
    h = jnp.asarray(rng.normal(size=(B2, N2, H)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B2, N2, 3)), jnp.float32)
    h_bond = jnp.asarray(rng.normal(size=(B2, NL, NL, H)), jnp.float32)
    node_mask = jnp.asarray(rng.random((B2, N2)) > 0.1)
    node_mask = node_mask.at[:, 0].set(True)
    norm_v = rng.normal(size=(B2, NP, 3))
    norm_v /= np.linalg.norm(norm_v, axis=-1, keepdims=True)
    phore_norm = jnp.asarray(norm_v, jnp.float32)

    for knn_k in (0, 3):
        mods = {}
        for style in ("split", "concat"):
            mods[style] = UniDenoiser(
                num_blocks=1, num_layers=2, hidden_dim=H, n_heads=HEADS,
                knn=4, edge_feat_dim=4, num_r_gaussian=20,
                scan_layers=False, remat_layers=False, triplet_knn=knn_k,
                edge_mlp_apply=style)
        args = (h, x, h_bond, node_mask)
        kw = dict(phore_norm=phore_norm, num_phore=NP)
        params = mods["split"].init(jax.random.PRNGKey(2), *args, **kw)
        out_s = mods["split"].apply(params, *args, **kw)
        out_c = mods["concat"].apply(params, *args, **kw)
        for key in ("h", "h_bond", "x"):
            np.testing.assert_allclose(
                np.asarray(out_s[key]), np.asarray(out_c[key]),
                rtol=5e-5, atol=5e-5, err_msg=f"{key} knn_k={knn_k}")
