"""Denoiser building blocks on padded dense graphs (flax.linen).

TPU-first re-design of the reference's PyG layers
(`models/uni_denoiser.py:13-298`): every scatter/segment op becomes a masked
dense op over fixed-shape arrays, every edge list becomes either a [B, N, K]
k-NN neighbour table or the dense [B, NL, NL] ligand bond grid, and the
triplet enumeration becomes a factorized masked [B, NL, NL, NL] attention.

Notation:  B batch, N = NP + NL composed nodes, NL ligand slots, K knn width,
H hidden, heads = number of attention heads.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.masked import masked_softmax
from ..ops.rbf import (angular_encoding, angular_encoding_freq_bands,
                       gaussian_smearing, gaussian_smearing_offsets)

ACTS = {
    "relu": nn.relu, "gelu": nn.gelu, "silu": nn.silu, "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid, "leakyrelu": nn.leaky_relu, "elu": nn.elu,
    "selu": nn.selu, "softplus": nn.softplus, "identity": lambda x: x,
}


def shifted_softplus(x):
    """softplus(x) - log(2) (reference `models/common.py:58-64`).

    The shift is a python float: a numpy scalar would be a strong dtype and
    silently promote bf16 activations to f32.
    """
    return nn.softplus(x) - 0.6931471805599453


def gather_nodes(h: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """h: [B, N, F], idx: [B, M, K] -> [B, M, K, F] (h[b, idx[b,m,k]])."""
    B, N, F = h.shape
    _, M, K = idx.shape
    flat = jnp.take_along_axis(h, idx.reshape(B, M * K, 1), axis=1)
    return flat.reshape(B, M, K, F)


class MLP(nn.Module):
    """Linear stack with LayerNorm+act between layers.

    Matches the reference `MLP` (`models/common.py:99-119`): num_layer linear
    maps; after every non-final layer (or all layers if act_last) apply
    LayerNorm (if norm) then the activation.
    """
    out_dim: int
    hidden_dim: int
    num_layer: int = 2
    norm: bool = True
    act_fn: str = "relu"
    act_last: bool = False

    @nn.compact
    def __call__(self, x):
        act = ACTS[self.act_fn]
        for i in range(self.num_layer):
            dim = self.out_dim if i == self.num_layer - 1 else self.hidden_dim
            x = nn.Dense(dim)(x)
            if i < self.num_layer - 1 or self.act_last:
                if self.norm:
                    x = nn.LayerNorm()(x)
                x = act(x)
        return x


class _RawDense(nn.Module):
    """Kernel/bias parameters with `nn.Dense`'s exact names and inits,
    returned raw so callers can apply them as split/fused matmuls."""
    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_dim, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _RawLayerNorm(nn.Module):
    """Scale/bias parameters with `nn.LayerNorm`'s exact names."""
    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class _EdgeMLPParams(nn.Module):
    """Parameter container with `MLP`'s exact tree
    ({Dense_0, LayerNorm_0, Dense_1}) — the 2-layer edge MLPs are *applied*
    by the parent as split matmuls (see module docstring) but their
    checkpoints stay interchangeable with the concat implementation."""
    in_dim: int
    hidden_dim: int
    out_dim: int
    norm: bool

    @nn.compact
    def __call__(self):
        k0, b0 = _RawDense(self.in_dim, self.hidden_dim, name="Dense_0")()
        ln = (_RawLayerNorm(self.hidden_dim, name="LayerNorm_0")()
              if self.norm else None)
        k1, b1 = _RawDense(self.hidden_dim, self.out_dim, name="Dense_1")()
        return k0, b0, ln, k1, b1


_LN_EPS = 1e-6  # flax LayerNorm default


def _ln_act_blocks(x, lns, act):
    """LayerNorm (fast-variance, per trailing-H block) + activation over
    x [..., P, H]; lns = P (scale, bias) pairs or (None, ...) when norm=False.
    Matches `nn.LayerNorm(use_fast_variance=True)` numerics exactly."""
    if lns[0] is not None:
        scale = jnp.stack([s for s, _ in lns])
        bias = jnp.stack([b for _, b in lns])
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu)
        x = (x - mu) * jax.lax.rsqrt(var + _LN_EPS) * scale + bias
    return act(x)


def _apply_mlp_params(p, x, act):
    """Apply an `_EdgeMLPParams` tree as a plain 2-layer MLP over a
    pre-concatenated input — the "concat" application style
    (`denoiser.edge_mlp_apply`): one wide grid matmul instead of split
    per-block matmuls. More grid FLOPs/bytes but fewer compiled ops; which
    style is faster is runtime-dependent (BASELINE.md round 3), the algebra
    and parameter tree are identical."""
    k0, b0, ln, k1, b1 = p
    y = x @ k0 + b0
    if ln is not None:
        scale, bias = ln
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y), axis=-1, keepdims=True) - jnp.square(mu)
        y = (y - mu) * jax.lax.rsqrt(var + _LN_EPS) * scale + bias
    return act(y) @ k1 + b1


def _pair_first_layer(edge_feat, h, p_k, p_v, fe, hn):
    """First linear layer of two parallel edge MLPs (k and v), applied as
    split matmuls over `concat([edge_feat, h_i, h_j])` without materializing
    the concat: the edge term runs on the grid once for both MLPs, the node
    terms run on the node axis.

    Returns (edge_pre [.., 2H], node_i [B,N,2H], node_j [B,N,2H]): caller
    broadcasts/gathers the node terms according to its grid layout.
    """
    k0k, b0k = p_k[0], p_k[1]
    k0v, b0v = p_v[0], p_v[1]
    we = jnp.concatenate([k0k[:fe], k0v[:fe]], axis=1)        # [Fe, 2H]
    wn = jnp.concatenate([k0k[fe:fe + hn], k0v[fe:fe + hn],
                          k0k[fe + hn:], k0v[fe + hn:]], axis=1)
    nproj = h @ wn                                            # [B, N, 4H]
    hh = nproj.shape[-1] // 2
    bias = jnp.concatenate([b0k, b0v])
    edge_pre = edge_feat @ we + bias
    return edge_pre, nproj[..., :hh], nproj[..., hh:]


class NodeUpdateKNN(nn.Module):
    """Multi-head attention node update over the k-NN neighbour table.

    Parity: `NodeUpdateLayer` (reference `models/uni_denoiser.py:13-72`) with
    scatter_softmax over incoming edges replaced by masked softmax over the
    fixed K axis. The k/v MLPs' first layer is applied as split matmuls
    (edge-grid term once for both, node terms on the node axis) — identical
    algebra to `MLP(concat([edge_feat, h_i, h_j]))` with the same parameter
    tree, at a fraction of the grid FLOPs/bytes (parity pinned by
    tests/test_layers_fused.py).
    """
    hidden_dim: int
    n_heads: int
    norm: bool = True
    act_fn: str = "relu"
    out_fc: bool = False
    apply_style: str = "split"

    @nn.compact
    def __call__(self, h, edge_feat, nbr_idx, nbr_mask, e_w=None):
        """h: [B,N,H]; edge_feat: [B,N,K,Fe]; nbr_idx/nbr_mask: [B,N,K]."""
        B, N, H = h.shape
        K = nbr_idx.shape[-1]
        d_head = self.hidden_dim // self.n_heads
        act = ACTS[self.act_fn]
        fe = edge_feat.shape[-1]
        in_dim = fe + 2 * H

        p_k = _EdgeMLPParams(in_dim, self.hidden_dim, self.hidden_dim,
                             self.norm, name="hk")()
        p_v = _EdgeMLPParams(in_dim, self.hidden_dim, self.hidden_dim,
                             self.norm, name="hv")()
        if self.apply_style == "concat":
            feat = jnp.concatenate(
                [edge_feat, jnp.broadcast_to(h[:, :, None, :], (B, N, K, H)),
                 gather_nodes(h, nbr_idx)], axis=-1)
            k = _apply_mlp_params(p_k, feat, act)
            v = _apply_mlp_params(p_v, feat, act)
        else:
            edge_pre, node_i, node_j = _pair_first_layer(edge_feat, h, p_k,
                                                         p_v, fe, H)
            pre = (edge_pre + node_i[:, :, None, :]
                   + gather_nodes(node_j, nbr_idx))           # [B,N,K,2H]
            x = _ln_act_blocks(pre.reshape(B, N, K, 2, self.hidden_dim),
                               (p_k[2], p_v[2]), act)
            k1 = jnp.stack([p_k[3], p_v[3]])                  # [2, H, H]
            b1 = jnp.stack([p_k[4], p_v[4]])
            kv = jnp.einsum("bnkph,pho->bnkpo", x, k1) + b1   # [B,N,K,2,H]
            k, v = kv[..., 0, :], kv[..., 1, :]
        if e_w is not None:
            v = v * e_w[..., None]
        q = MLP(self.hidden_dim, self.hidden_dim, norm=self.norm,
                act_fn=self.act_fn, name="hq")(h)

        k = k.reshape(B, N, K, self.n_heads, d_head)
        v = v.reshape(B, N, K, self.n_heads, d_head)
        q = q.reshape(B, N, 1, self.n_heads, d_head)
        scores = jnp.sum(q * k, axis=-1) / float(np.sqrt(d_head))   # [B,N,K,heads]
        alpha = masked_softmax(scores, nbr_mask[..., None], axis=2)
        out = jnp.sum(alpha[..., None] * v, axis=2)          # [B,N,heads,dh]
        out = out.reshape(B, N, self.hidden_dim)
        if self.out_fc:
            out = MLP(self.hidden_dim, self.hidden_dim, norm=self.norm,
                      act_fn=self.act_fn, name="node_output")(
                jnp.concatenate([out, h], axis=-1))
        return out


class NodeUpdateDense(nn.Module):
    """Node update attending over the dense [src, dst] pair grid.

    Used (a) for ligand-bond message passing (edge features = bond hidden
    state, pairs = all directed ligand pairs) and (b) for the fully-connected
    phore self-encoder (edge feature = pairwise distance, self-loops KEPT to
    match `fully_connect_two_graphs`, reference `models/common.py:329-356`).
    """
    hidden_dim: int
    n_heads: int
    norm: bool = True
    act_fn: str = "relu"
    out_fc: bool = False
    apply_style: str = "split"

    @nn.compact
    def __call__(self, h, edge_feat, pair_mask, e_w=None):
        """h: [B,N,H]; edge_feat: [B,N_src,N_dst,Fe]; pair_mask same grid."""
        B, N, H = h.shape
        d_head = self.hidden_dim // self.n_heads
        act = ACTS[self.act_fn]
        fe = edge_feat.shape[-1]
        in_dim = fe + 2 * H

        p_k = _EdgeMLPParams(in_dim, self.hidden_dim, self.hidden_dim,
                             self.norm, name="hk")()
        p_v = _EdgeMLPParams(in_dim, self.hidden_dim, self.hidden_dim,
                             self.norm, name="hv")()
        if self.apply_style == "concat":
            # h_i = destination (axis 2), h_j = source (axis 1)
            feat = jnp.concatenate(
                [edge_feat,
                 jnp.broadcast_to(h[:, None, :, :], (B, N, N, H)),
                 jnp.broadcast_to(h[:, :, None, :], (B, N, N, H))], axis=-1)
            k = _apply_mlp_params(p_k, feat, act)
            v = _apply_mlp_params(p_v, feat, act)
        else:
            edge_pre, node_i, node_j = _pair_first_layer(edge_feat, h, p_k,
                                                         p_v, fe, H)
            # h_i = destination (axis 2), h_j = source (axis 1)
            pre = (edge_pre + node_i[:, None, :, :] + node_j[:, :, None, :])
            x = _ln_act_blocks(pre.reshape(B, N, N, 2, self.hidden_dim),
                               (p_k[2], p_v[2]), act)
            k1 = jnp.stack([p_k[3], p_v[3]])
            b1 = jnp.stack([p_k[4], p_v[4]])
            kv = jnp.einsum("bsdph,pho->bsdpo", x, k1) + b1
            k, v = kv[..., 0, :], kv[..., 1, :]
        if e_w is not None:
            v = v * e_w[..., None]
        q = MLP(self.hidden_dim, self.hidden_dim, norm=self.norm,
                act_fn=self.act_fn, name="hq")(h)

        k = k.reshape(B, N, N, self.n_heads, d_head)
        v = v.reshape(B, N, N, self.n_heads, d_head)
        q = q.reshape(B, 1, N, self.n_heads, d_head)             # per dst
        scores = jnp.sum(q * k, axis=-1) / float(np.sqrt(d_head))       # [B,src,dst,heads]
        alpha = masked_softmax(scores, pair_mask[..., None], axis=1)
        out = jnp.sum(alpha[..., None] * v, axis=1)              # [B,dst,heads,dh]
        out = out.reshape(B, N, self.hidden_dim)
        if self.out_fc:
            out = MLP(self.hidden_dim, self.hidden_dim, norm=self.norm,
                      act_fn=self.act_fn, name="node_output")(
                jnp.concatenate([out, h], axis=-1))
        return out


class PosUpdateKNN(nn.Module):
    """Equivariant position update over the k-NN table.

    Parity: `PosUpdateLayer` (reference `models/uni_denoiser.py:168-209`):
    value = scalar-per-head * rel_x, output = mean over heads.
    """
    hidden_dim: int
    n_heads: int
    norm: bool = True
    act_fn: str = "relu"
    apply_style: str = "split"

    @nn.compact
    def __call__(self, h, rel_x, edge_feat, nbr_idx, nbr_mask, e_w=None):
        """rel_x: [B,N,K,3] = x[dst] - x[src]."""
        B, N, H = h.shape
        K = nbr_idx.shape[-1]
        d_head = self.hidden_dim // self.n_heads
        act = ACTS[self.act_fn]
        fe = edge_feat.shape[-1]
        in_dim = fe + 2 * H

        p_k = _EdgeMLPParams(in_dim, self.hidden_dim, self.hidden_dim,
                             self.norm, name="xk")()
        p_v = _EdgeMLPParams(in_dim, self.hidden_dim, self.n_heads,
                             self.norm, name="xv")()
        if self.apply_style == "concat":
            feat = jnp.concatenate(
                [edge_feat, jnp.broadcast_to(h[:, :, None, :], (B, N, K, H)),
                 gather_nodes(h, nbr_idx)], axis=-1)
            k = _apply_mlp_params(p_k, feat, act)             # [B,N,K,H]
            v = _apply_mlp_params(p_v, feat, act)             # [B,N,K,heads]
        else:
            edge_pre, node_i, node_j = _pair_first_layer(edge_feat, h, p_k,
                                                         p_v, fe, H)
            pre = (edge_pre + node_i[:, :, None, :]
                   + gather_nodes(node_j, nbr_idx))
            x = _ln_act_blocks(pre.reshape(B, N, K, 2, self.hidden_dim),
                               (p_k[2], p_v[2]), act)
            k = x[..., 0, :] @ p_k[3] + p_k[4]                # [B,N,K,H]
            v = x[..., 1, :] @ p_v[3] + p_v[4]                # [B,N,K,heads]
        if e_w is not None:
            v = v * e_w[..., None]
        v = v[..., None] * rel_x[:, :, :, None, :]            # [B,N,K,heads,3]
        q = MLP(self.hidden_dim, self.hidden_dim, norm=self.norm,
                act_fn=self.act_fn, name="xq")(h)

        k = k.reshape(B, N, K, self.n_heads, d_head)
        q = q.reshape(B, N, 1, self.n_heads, d_head)
        scores = jnp.sum(q * k, axis=-1) / float(np.sqrt(d_head))
        alpha = masked_softmax(scores, nbr_mask[..., None], axis=2)
        out = jnp.sum(alpha[..., None] * v, axis=2)           # [B,N,heads,3]
        return jnp.mean(out, axis=2)                          # [B,N,3]


class PosUpdateDense(nn.Module):
    """Equivariant position update over the dense ligand bond grid."""
    hidden_dim: int
    n_heads: int
    norm: bool = True
    act_fn: str = "relu"
    apply_style: str = "split"

    @nn.compact
    def __call__(self, h, rel_x, edge_feat, pair_mask, e_w=None):
        """rel_x: [B,src,dst,3] = x[dst] - x[src]; edge_feat on same grid."""
        B, N, H = h.shape
        d_head = self.hidden_dim // self.n_heads
        act = ACTS[self.act_fn]
        fe = edge_feat.shape[-1]
        in_dim = fe + 2 * H

        p_k = _EdgeMLPParams(in_dim, self.hidden_dim, self.hidden_dim,
                             self.norm, name="xk")()
        p_v = _EdgeMLPParams(in_dim, self.hidden_dim, self.n_heads,
                             self.norm, name="xv")()
        if self.apply_style == "concat":
            feat = jnp.concatenate(
                [edge_feat,
                 jnp.broadcast_to(h[:, None, :, :], (B, N, N, H)),
                 jnp.broadcast_to(h[:, :, None, :], (B, N, N, H))], axis=-1)
            k = _apply_mlp_params(p_k, feat, act)
            v = _apply_mlp_params(p_v, feat, act)             # [B,N,N,heads]
        else:
            edge_pre, node_i, node_j = _pair_first_layer(edge_feat, h, p_k,
                                                         p_v, fe, H)
            pre = (edge_pre + node_i[:, None, :, :] + node_j[:, :, None, :])
            x = _ln_act_blocks(pre.reshape(B, N, N, 2, self.hidden_dim),
                               (p_k[2], p_v[2]), act)
            k = x[..., 0, :] @ p_k[3] + p_k[4]
            v = x[..., 1, :] @ p_v[3] + p_v[4]                # [B,N,N,heads]
        if e_w is not None:
            v = v * e_w[..., None]
        v = v[..., None] * rel_x[:, :, :, None, :]            # [B,N,N,heads,3]
        q = MLP(self.hidden_dim, self.hidden_dim, norm=self.norm,
                act_fn=self.act_fn, name="xq")(h)

        k = k.reshape(B, N, N, self.n_heads, d_head)
        q = q.reshape(B, 1, N, self.n_heads, d_head)
        scores = jnp.sum(q * k, axis=-1) / float(np.sqrt(d_head))
        alpha = masked_softmax(scores, pair_mask[..., None], axis=1)
        out = jnp.sum(alpha[..., None] * v, axis=1)           # [B,dst,heads,3]
        return jnp.mean(out, axis=2)


class BondUpdateTriplet(nn.Module):
    """Triplet (k->j->i) angular attention over the dense ligand grid.

    Parity: `BondUpdateLayer` (reference `models/uni_denoiser.py:75-165`)
    with the SparseTensor triplet enumeration replaced by a factorized masked
    [B, NL, NL, NL] attention:

      kv_input(k,j,i) = [h_bond(k,j), rbf(d_kj), rbf(d_ji), ang(k,j,i), h_k, h_j]
      q_input(j,i)    = [h_bond(j,i), h_i]                (include_h_node=True)
      alpha over k grouped by target bond (j,i); i==k triplets masked out.

    The first linear layer of the k/v MLPs is algebraically split into a
    (k,j)-indexed term, a (j,i)-indexed term, and the 13-dim angular term —
    only the angular contribution touches the O(NL^3) grid before the
    nonlinearity, cutting the dominant matmul cost by ~30x versus naive
    concatenation.

    Modes (TPU-first divergence, config `denoiser.triplet_mode`):
    - 'dense': per-triplet features at full hidden width H — exact-width
      analogue of the reference MLPs. O(NL^3 * H) memory traffic; the
      correctness reference.
    - 'factorized' (default): per-triplet nonlinear features at width
      `triplet_width` (Wt << H); attention logits are a bilinear form
      q_ji^T pre_kji per head, and the value path pools `pre` directly
      (out = Dense(sum_k alpha * pre)). Same structure — nonlinear
      angular+distance+bond triplet features, attention over k grouped by
      target bond (j,i), query from [h_bond_ji, h_i] — at ~H/Wt x less
      HBM traffic and FLOPs, which is what makes 1000-step sampling
      viable on TPU (SURVEY.md §7.4 risk item).
    """
    hidden_dim: int
    n_heads: int
    norm: bool = True
    act_fn: str = "relu"
    include_h_node: bool = True
    num_ang_funcs: int = 3
    mode: str = "factorized"
    width: int = 32
    use_pallas: bool = False
    apply_style: str = "split"
    knn_k: int = 0  # >0: restrict k to the K nearest neighbours of j
    # kNN path only: run the triplet pool in the compute dtype instead of
    # pinned f32 (softmax stays f32). No effect at compute_dtype=float32;
    # the exact/pallas pool keeps its tuned-to-2e-6 f32 numerics.
    pool_follow_dtype: bool = True

    @nn.compact
    def __call__(self, h, h_bond, pos, node_mask, trip_frozen=None):
        """h: [B,NL,H]; h_bond: [B,NL,NL,H] (src,dst); pos: [B,NL,3];
        node_mask: [B,NL]; trip_frozen: optional precomputed (idx, mask)
        kNN table for the source-bond restriction (block_knn_freeze).
        Returns bond update [B,NL,NL,H]."""
        B, N, H = h.shape
        d_head = self.hidden_dim // self.n_heads
        act = ACTS[self.act_fn]
        offsets, coeff = gaussian_smearing_offsets(fix_offset=True)
        offsets = jnp.asarray(offsets)

        # pairwise distances (shared by both modes); the distance features
        # drop to the compute dtype at the feature boundary (pos stays f32)
        rel = pos[:, :, None, :] - pos[:, None, :, :]         # rel[x,i] = x - i
        dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1) + 1e-12)  # [B,N,N]
        r_feat = gaussian_smearing(dist, offsets, coeff
                                   ).astype(h.dtype)          # [B,N,N,20]

        if self.mode == "factorized":
            return self._factorized(h, h_bond, r_feat, pos, node_mask, act,
                                    trip_frozen)
        freq_bands = jnp.asarray(
            angular_encoding_freq_bands(self.num_ang_funcs))  # dense only

        # angle at i between j->i and k->i, via |a×b|^2 = |a|^2|b|^2-(a.b)^2
        # dot[j,k,i] = rel[j,i] . rel[k,i]
        dot = jnp.einsum("bjic,bkic->bjki", rel, rel)         # [B,j,k,i]
        nsq = jnp.sum(rel * rel, axis=-1)                      # [B,x,i]
        from ..ops.pallas_triplet import CROSS_SQ_EPS
        cross_sq = nsq[:, :, None, :] * nsq[:, None, :, :] - dot * dot
        # CROSS_SQ_EPS clamp: degenerate triplets otherwise NaN the position
        # gradient (see ops/pallas_triplet.py)
        cross = jnp.sqrt(jnp.clip(cross_sq, CROSS_SQ_EPS, None))
        angle = jnp.arctan2(cross, dot)                        # [B,j,k,i]
        a_feat = angular_encoding(angle, freq_bands
                                  ).astype(h.dtype)            # [B,j,k,i,13]

        # triplet mask: k,j,i valid; k!=j; j!=i; k!=i
        # (reference `uni_denoiser.py:115`)
        m = node_mask
        valid3 = (m[:, :, None, None] & m[:, None, :, None]
                  & m[:, None, None, :])
        idx = jnp.arange(N)
        neq_kj = idx[:, None, None] != idx[None, :, None]
        neq_ji = idx[None, :, None] != idx[None, None, :]
        neq_ki = idx[:, None, None] != idx[None, None, :]
        tri_mask = valid3 & (neq_kj & neq_ji & neq_ki)[None]   # [B,k,j,i]

        # ---- dense (exact-width) path ----
        # factorized first linear layer of the k/v MLPs; full kv_input order:
        # [h_bond_kj, r_kj, r_ji, a_feat, (h_k, h_j)]
        hk_exp = jnp.broadcast_to(h[:, :, None, :], (B, N, N, H))  # h[src=k]
        hj_exp = jnp.broadcast_to(h[:, None, :, :], (B, N, N, H))  # h[dst=j]
        if self.include_h_node:
            f_kj = jnp.concatenate([h_bond, r_feat, hk_exp, hj_exp], axis=-1)
        else:
            f_kj = jnp.concatenate([h_bond, r_feat], axis=-1)
        f_ji = r_feat                                             # (j,i) block

        def fused_first_layer(name):
            dense_kj = nn.Dense(self.hidden_dim, name=f"{name}_kj")
            dense_ji = nn.Dense(self.hidden_dim, use_bias=False,
                                name=f"{name}_ji")
            dense_a = nn.Dense(self.hidden_dim, use_bias=False,
                               name=f"{name}_ang")
            a_kj = dense_kj(f_kj)              # [B,k,j,H]
            a_ji = dense_ji(f_ji)              # [B,j,i,H]
            a_ang = dense_a(a_feat)            # [B,j,k,i,H]
            # triplet grid indexed [B, k, j, i, H]
            pre = (a_kj[:, :, :, None, :] + a_ji[:, None, :, :, :]
                   + a_ang.transpose(0, 2, 1, 3, 4))
            return pre

        def mlp_tail(pre, name):
            if self.norm:
                pre = nn.LayerNorm(name=f"{name}_ln")(pre)
            pre = act(pre)
            return nn.Dense(self.hidden_dim, name=f"{name}_out")(pre)

        k_t = mlp_tail(fused_first_layer("hk"), "hk")   # [B,k,j,i,H]
        v_t = mlp_tail(fused_first_layer("hv"), "hv")

        # query per target bond (j,i)
        if self.include_h_node:
            hi_exp = jnp.broadcast_to(h[:, None, :, :], (B, N, N, H))
            q_input = jnp.concatenate([h_bond, hi_exp], axis=-1)
        else:
            q_input = h_bond
        q = MLP(self.hidden_dim, self.hidden_dim, norm=self.norm,
                act_fn=self.act_fn, name="hq")(q_input)  # [B,j,i,H]

        k_t = k_t.reshape(B, N, N, N, self.n_heads, d_head)
        v_t = v_t.reshape(B, N, N, N, self.n_heads, d_head)
        q = q.reshape(B, 1, N, N, self.n_heads, d_head)
        scores = jnp.sum(q * k_t, axis=-1) / float(np.sqrt(d_head))  # [B,k,j,i,heads]

        alpha = masked_softmax(scores, tri_mask[..., None], axis=1)  # over k
        out = jnp.sum(alpha[..., None] * v_t, axis=1)  # [B,j,i,heads,dh]
        return out.reshape(B, N, N, self.hidden_dim)

    def _factorized(self, h, h_bond, r_feat, pos, node_mask, act,
                    trip_frozen=None):
        """Width-Wt triplet attention: pre_kji = act(LN(a_kj + a_ji + a_ang)),
        logits_kji,h = q_ji,h . pre_kji / sqrt(Wt), out_ji = Dense over the
        per-head alpha-pooled pre features. The O(NL^3)-grid segment runs in
        either the XLA reference or the fused Pallas kernel
        (`ops/pallas_triplet.py`, `use_pallas`)."""
        from ..ops.pallas_triplet import triplet_pool

        B, N, H = h.shape
        Wt = self.width
        heads = self.n_heads
        ang_dim = 1 + 4 * self.num_ang_funcs
        act_q = ACTS[self.act_fn]

        # tf_kj applied as split matmuls over
        # concat([h_bond, r_feat, h_k, h_j]) without materializing the
        # 3H+20-wide grid concat (same algebra + param tree; the h_bond and
        # r_feat terms run on the [N,N] grid, node terms on the node axis)
        rf_dim = r_feat.shape[-1]
        in_kj = H + rf_dim + (2 * H if self.include_h_node else 0)
        k_kj, b_kj = _RawDense(in_kj, Wt, name="tf_kj")()
        if self.apply_style == "concat":
            parts = [h_bond, r_feat]
            if self.include_h_node:
                parts += [jnp.broadcast_to(h[:, :, None, :], (B, N, N, H)),
                          jnp.broadcast_to(h[:, None, :, :], (B, N, N, H))]
            a_kj = jnp.concatenate(parts, axis=-1) @ k_kj + b_kj
        else:
            a_kj = (h_bond @ k_kj[:H]
                    + r_feat @ k_kj[H:H + rf_dim] + b_kj)      # [B,k,j,Wt]
            if self.include_h_node:
                wn = jnp.concatenate([k_kj[H + rf_dim:H + rf_dim + H],
                                      k_kj[H + rf_dim + H:]], axis=1)
                nproj = h @ wn                                 # [B,N,2Wt]
                a_kj = (a_kj + nproj[..., :Wt][:, :, None, :]  # h[src=k]
                        + nproj[..., Wt:][:, None, :, :])      # h[dst=j]
        a_ji = nn.Dense(Wt, use_bias=False, name="tf_ji")(r_feat)
        # raw params (shared by XLA and Pallas paths)
        w_ang = self.param("tf_ang_w", nn.initializers.lecun_normal(),
                           (ang_dim, Wt))
        ln_scale = self.param("tf_ln_scale", nn.initializers.ones, (Wt,)) \
            if self.norm else jnp.ones((Wt,))
        ln_bias = self.param("tf_ln_bias", nn.initializers.zeros, (Wt,)) \
            if self.norm else jnp.zeros((Wt,))

        # tf_q: split first layer over concat([h_bond, h_i]) (same trick)
        in_q = H + (H if self.include_h_node else 0)
        pq = _EdgeMLPParams(in_q, self.hidden_dim, heads * Wt, self.norm,
                            name="tf_q")()
        if self.apply_style == "concat":
            q_in = h_bond
            if self.include_h_node:
                q_in = jnp.concatenate(
                    [h_bond,
                     jnp.broadcast_to(h[:, None, :, :], (B, N, N, H))], -1)
            q = _apply_mlp_params(pq, q_in, act_q)             # [B,j,i,h*Wt]
        else:
            q_pre = h_bond @ pq[0][:H] + pq[1]
            if self.include_h_node:
                q_pre = q_pre + (h @ pq[0][H:])[:, None, :, :]  # h[dst=i]
            q = _ln_act_blocks(q_pre[..., None, :], (pq[2],), act_q)[..., 0, :]
            q = q @ pq[3] + pq[4]                              # [B,j,i,h*Wt]
        q = q.reshape(B, N, N, heads, Wt)

        # the exact-grid triplet pool always runs f32: its numerics are tuned
        # to ~2e-6 of f64 truth (scripts/drift_triplet.py) and the O(N^3)
        # intermediates either stay in VMEM (pallas) or are Wt-narrow (XLA).
        # The kNN pool may follow a bf16 compute dtype (pool_follow_dtype):
        # its [N,N,K,*] grids dominate the per-step activation footprint.
        f32 = lambda t: t.astype(jnp.float32)
        if self.knn_k > 0 and self.knn_k < N - 1:
            if self.pool_follow_dtype and h.dtype != jnp.float32:
                cast = lambda t: t.astype(h.dtype)
            else:
                cast = f32
            pooled = self._pool_knn(cast(a_kj), cast(a_ji), cast(q), pos,
                                    node_mask, cast(w_ang), cast(ln_scale),
                                    cast(ln_bias), act, trip_frozen)
        else:
            pooled = triplet_pool(f32(a_kj), f32(a_ji), f32(q), pos,
                                  node_mask, f32(w_ang), f32(ln_scale),
                                  f32(ln_bias), act, self.norm,
                                  num_ang_funcs=self.num_ang_funcs,
                                  use_pallas=self.use_pallas)
        out = nn.Dense(self.hidden_dim, name="tf_out")(pooled.astype(h.dtype))
        return out

    def _pool_knn(self, a_kj, a_ji, q, pos, node_mask, w_ang, ln_scale,
                  ln_bias, act, trip_frozen=None):
        """k restricted to the K nearest neighbours of j: O(NL^2 K) grids.

        TPU-first divergence (config `denoiser.triplet_knn`): the reference
        attends over every source bond k->j of the fully-connected graph;
        distant k carry negligible attention mass, so truncating to the
        spatial neighbourhood preserves the inductive bias at a fraction of
        the memory/FLOPs — the lever that makes 64/80-atom buckets cheap.
        """
        from ..ops.knn import knn_neighbors
        from ..ops.pallas_triplet import (CROSS_SQ_EPS, LN_EPS, NEG_INF,
                                          _angle_encode)

        B, N, _, Wt = a_kj.shape
        heads = q.shape[-2]
        K = self.knn_k
        freq = jnp.asarray(angular_encoding_freq_bands(self.num_ang_funcs))

        if trip_frozen is not None:
            nbr_idx, nbr_mask = trip_frozen           # frozen per block
        else:
            nbr_idx, nbr_mask = knn_neighbors(pos, node_mask, K)  # k in knn(j)
        # gather a_kj -> [B, j, K, Wt]
        a_kj_j = jnp.take_along_axis(
            a_kj.transpose(0, 2, 1, 3),                        # [B, j, k, Wt]
            nbr_idx[..., None], axis=2)
        pos_k = gather_nodes(pos, nbr_idx)                     # [B, j, K, 3]

        # angle at i between j->i and k->i
        rel_ji = pos[:, :, None, :] - pos[:, None, :, :]       # [B, j?, i, 3]
        rel_ki = pos_k[:, :, :, None, :] - pos[:, None, None, :, :]
        dot = jnp.sum(rel_ji[:, :, None, :, :] * rel_ki, -1)   # [B, j, K, i]
        njsq = jnp.sum(rel_ji * rel_ji, -1)                    # [B, j, i]
        nksq = jnp.sum(rel_ki * rel_ki, -1)                    # [B, j, K, i]
        cross = jnp.sqrt(jnp.clip(
            njsq[:, :, None, :] * nksq - dot * dot, CROSS_SQ_EPS, None))
        angle = jnp.arctan2(cross, dot)                        # [B, j, K, i]
        # geometry stays f32 (pos-derived); the encode matmul drops to the
        # pool dtype at the feature boundary
        a_ang = _angle_encode(angle, freq).astype(w_ang.dtype) @ w_ang

        pre = (a_kj_j[:, :, :, None, :] + a_ji[:, :, None, :, :] + a_ang)
        if self.norm:
            mu = jnp.mean(pre, axis=-1, keepdims=True)
            var = jnp.mean((pre - mu) ** 2, axis=-1, keepdims=True)
            pre = (pre - mu) * jax.lax.rsqrt(var + LN_EPS) * ln_scale + ln_bias
        pre = act(pre)

        # logits/softmax in f32 regardless of the pool dtype
        scores = jnp.einsum("bjkiw,bjihw->bjkih", pre, q,
                            preferred_element_type=jnp.float32
                            ) / float(np.sqrt(Wt))
        # mask: k valid neighbour of j; i valid; k != i; i != j (k != j is
        # guaranteed by knn_neighbors excluding self)
        idx = jnp.arange(N)
        neq_ki = nbr_idx[..., None] != idx[None, None, None, :]  # [B,j,K,i]
        neq_ji = (idx[:, None] != idx[None, :])[None, :, None, :]
        valid = (nbr_mask[..., None] & node_mask[:, None, None, :]
                 & node_mask[:, :, None, None] & neq_ki & neq_ji)
        alpha = masked_softmax(scores, valid[..., None], axis=2)  # over K
        pooled = jnp.einsum("bjkih,bjkiw->bjihw", alpha.astype(pre.dtype),
                            pre)
        return pooled.reshape(B, N, N, heads * Wt)
