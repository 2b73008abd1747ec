"""Fused whole-layer-stack execution of the denoiser (Pallas TPU kernel).

The denoiser's per-step cost on TPU is not FLOPs (a forward is ~40 GFLOP at
B=16) but the HBM round-trips and kernel-launch overhead of ~1.5k compiled
thunks materializing [B,N,K,*]/[B,NL,NL,*] edge grids: measured 20 ms per
reverse-diffusion iteration against ~0.3 ms of MXU time
(scripts/relay_microbench.py, BASELINE.md round 3). This module collapses
the entire `num_layers` attention stack into ONE `pallas_call`:

    grid = (batch, layer)   # layer minor => sequential per graph
    carry (h, x, h_bond) lives in VMEM scratch across layer steps;
    per-layer packed weights stream HBM->VMEM via BlockSpec pipelining;
    every edge/triplet grid is a VMEM value that never reaches HBM.

Scope: the flagship configuration only — norm=True, x2h_out_fc=False,
include_h_node=True, direction_match=True, factorized kNN triplet mode
(`triplet_knn > 0`), e_w from `use_global_ew`. Everything else falls back
to the XLA path. Two documented approximations versus the per-layer-exact
XLA path (both config-gated by `denoiser.block_knn_freeze`, which is forced
on for this kernel): the dire 3-NN centroid set and the kNN triplet source
set are chosen once per block — their *values* still use current positions.
The oracle for parity tests is the XLA path with `block_knn_freeze=True`
(identical math by construction).

Gathers become one-hot matmuls (MXU-friendly, no dynamic indexing):
`nbr_onehot [N*K, N] @ h` replaces `take_along_axis`; the triplet gather
over source bonds uses a flattened [NL*K8, NL*NL] selection matrix against
the bond grid. All built once per block in XLA (`build_block_tables`).

Reference math: `AttentionLayerO2TwoUpdateNodeGeneral`
(reference `models/uni_denoiser.py:212-298`) as re-designed in
`models/layers.py`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rbf import angular_encoding_freq_bands, gaussian_smearing_offsets

LN_EPS = 1e-6
NEG_INF = -1e9
CROSS_SQ_EPS = 1e-12


# --------------------------------------------------------------------------
# per-block constant tables (XLA, outside the kernel)
# --------------------------------------------------------------------------

def build_block_tables(x, node_mask, nbr_idx, nbr_mask, num_phore: int,
                       trip_k: int, dtype=jnp.float32) -> Dict[str, Any]:
    """One-hot/selection tables for the kernel, built once per block.

    x: [B,N,3]; node_mask: [B,N]; nbr_idx/nbr_mask: [B,N,K] from the block's
    kNN rebuild. Returns a dict of arrays with leading batch dim.
    """
    from .knn import knn_neighbors

    B, N, K = nbr_idx.shape
    NP = num_phore
    NL = N - NP
    # knn_neighbors clamps k to NL-1 (no self-edges); mirror that here so
    # the reshape widths below agree with the returned column count.
    trip_k = min(trip_k, NL - 1)
    mask_l = node_mask[:, NP:]
    pos_l = x[:, NP:]

    nbr_oh = jax.nn.one_hot(nbr_idx, N, dtype=dtype)       # [B,N,K,N]
    nbr_oh = nbr_oh * nbr_mask[..., None].astype(dtype)

    # ONE ligand kNN serves both the dire 3-NN centroid operator and the
    # triplet selection: top_k returns neighbours sorted nearest-first, so
    # the k=3 set is exactly the first 3 columns of the k=max(3,K8) set.
    kmax = max(3, trip_k)
    idx_m, mask_m = knn_neighbors(pos_l, mask_l, kmax)
    lig3_idx, lig3_mask = idx_m[..., :3], mask_m[..., :3]
    w3 = jax.nn.one_hot(lig3_idx, NL, dtype=dtype) \
        * lig3_mask[..., None].astype(dtype)               # [B,NL,3,NL]
    cnt = jnp.maximum(jnp.sum(lig3_mask.astype(dtype), -1), 1.0)
    w3 = jnp.sum(w3, axis=2) / cnt[..., None]              # [B,NL,NL]

    # kNN triplet selection: one-hot over source nodes only ([B,j,K8,m] —
    # the per-j bond-grid gather happens in-kernel as a leading-axis
    # reduce, so no [NL*K8, NL*NL] selection matrix is ever materialized)
    trip_idx, trip_mask = idx_m[..., :trip_k], mask_m[..., :trip_k]
    k_oh = jax.nn.one_hot(trip_idx, NL, dtype=dtype)       # [B,j,K8,m]
    sel_row = k_oh.reshape(B, NL * trip_k, NL)             # pos_k gather

    # triplet validity: k neighbour valid & i valid & k != i & j != i
    # (layout [B, K8, j, i]: the kernel reduces over the leading K8 axis)
    idx = jnp.arange(NL)
    neq_ki = trip_idx[..., None] != idx[None, None, None, :]  # [B,j,K8,i]
    neq_ji = (idx[:, None] != idx[None, :])[None, :, None, :]
    trip_valid = (trip_mask[..., None] & mask_l[:, None, None, :]
                  & mask_l[:, :, None, None] & neq_ki & neq_ji
                  ).transpose(0, 2, 1, 3)                  # [B,K8,j,i]

    eye = jnp.eye(NL, dtype=bool)
    pair_mask = mask_l[:, :, None] & mask_l[:, None, :] & ~eye

    return {
        "nbr_onehot": nbr_oh.reshape(B, N * K, N),
        "nbr_mask": nbr_mask.astype(dtype)[..., None],     # [B,N,K,1]
        "lig3_w": w3,                                      # [B,NL,NL]
        "trip_sel_row": sel_row,                           # [B,NL*K8,NL]
        "trip_valid": trip_valid.astype(dtype),            # [B,K8,NL,NL]
        "pair_mask": pair_mask.astype(dtype)[..., None],   # [B,NL,NL,1]
        "mask_l": mask_l.astype(dtype)[..., None],         # [B,NL,1]
    }


# --------------------------------------------------------------------------
# per-layer weight packing (XLA, loop-invariant)
# --------------------------------------------------------------------------

def _mlp_parts(t):
    return (t["Dense_0"]["kernel"], t["Dense_0"]["bias"],
            t["LayerNorm_0"]["scale"], t["LayerNorm_0"]["bias"],
            t["Dense_1"]["kernel"], t["Dense_1"]["bias"])


def pack_layer_params(raw: Dict[str, Any], hidden: int, fe: int,
                      dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Stacked per-layer param tree -> packed matrices (leading dim L).

    `raw` is `params['denoiser']['layers']['layer']` (every leaf [L, ...]).
    `fe` = knn edge-feature width (93 with direction_match).
    Packing fuses the four knn-edge first layers into one [fe, 4H] matmul
    operand and groups node projections so the kernel runs few, large dots.
    """
    H = hidden

    def cat(arrs, axis):
        return jnp.concatenate([a.astype(dtype) for a in arrs], axis=axis)

    out: Dict[str, jnp.ndarray] = {}
    nle, ple = raw["node_layer_with_edge"], raw["pos_layer_with_edge"]
    nlb, plb = raw["node_layer_with_bond"], raw["pos_layer_with_bond"]

    k_hk = _mlp_parts(nle["hk"])
    k_hv = _mlp_parts(nle["hv"])
    k_xk = _mlp_parts(ple["xk"])
    k_xv = _mlp_parts(ple["xv"])
    # first-layer split rows: [:, :fe] edge part, then h_i rows, h_j rows
    out["e_W"] = cat([k[0][:, :fe] for k in (k_hk, k_hv, k_xk, k_xv)], 2)
    out["e_b"] = cat([k[1] for k in (k_hk, k_hv, k_xk, k_xv)], 1)  # [L,4H]
    # node projections: separate packs for h (node upd) and new_h (pos upd)
    out["e_Wn_h"] = cat([k_hk[0][:, fe:fe + H], k_hv[0][:, fe:fe + H],
                         k_hk[0][:, fe + H:], k_hv[0][:, fe + H:]], 2)
    out["e_Wn_nh"] = cat([k_xk[0][:, fe:fe + H], k_xv[0][:, fe:fe + H],
                          k_xk[0][:, fe + H:], k_xv[0][:, fe + H:]], 2)
    out["e_ln_s"] = cat([k[2][:, None, :] for k in (k_hk, k_hv, k_xk, k_xv)],
                        1)                                  # [L,4,H]
    out["e_ln_b"] = cat([k[3][:, None, :] for k in (k_hk, k_hv, k_xk, k_xv)],
                        1)
    out["e_k2"] = cat([k_hk[4][:, None], k_hv[4][:, None]], 1)  # [L,2,H,H]
    out["e_b2"] = cat([k_hk[5][:, None], k_hv[5][:, None]], 1)  # [L,2,H]
    out["e_xk2"] = k_xk[4].astype(dtype)                    # [L,H,H]
    out["e_xk2b"] = k_xk[5].astype(dtype)
    out["e_xv2"] = k_xv[4].astype(dtype)                    # [L,H,heads]
    out["e_xv2b"] = k_xv[5].astype(dtype)

    b_hk = _mlp_parts(nlb["hk"])
    b_hv = _mlp_parts(nlb["hv"])
    b_xk = _mlp_parts(plb["xk"])
    b_xv = _mlp_parts(plb["xv"])
    # dense-grid first layers: edge part = h_bond (width H)
    out["b_W"] = cat([k[0][:, :H] for k in (b_hk, b_hv)], 2)   # [L,H,2H]
    out["b_b"] = cat([k[1] for k in (b_hk, b_hv)], 1)
    out["b_Wn"] = cat([b_hk[0][:, H:2 * H], b_hv[0][:, H:2 * H],
                       b_hk[0][:, 2 * H:], b_hv[0][:, 2 * H:]], 2)
    out["b_ln_s"] = cat([k[2][:, None, :] for k in (b_hk, b_hv)], 1)
    out["b_ln_b"] = cat([k[3][:, None, :] for k in (b_hk, b_hv)], 1)
    out["b_k2"] = cat([b_hk[4][:, None], b_hv[4][:, None]], 1)
    out["b_b2"] = cat([b_hk[5][:, None], b_hv[5][:, None]], 1)
    out["p_W"] = cat([k[0][:, :H] for k in (b_xk, b_xv)], 2)
    out["p_b"] = cat([k[1] for k in (b_xk, b_xv)], 1)
    out["p_Wn"] = cat([b_xk[0][:, H:2 * H], b_xv[0][:, H:2 * H],
                       b_xk[0][:, 2 * H:], b_xv[0][:, 2 * H:]], 2)
    out["p_ln_s"] = cat([k[2][:, None, :] for k in (b_xk, b_xv)], 1)
    out["p_ln_b"] = cat([k[3][:, None, :] for k in (b_xk, b_xv)], 1)
    out["p_xk2"] = b_xk[4].astype(dtype)
    out["p_xk2b"] = b_xk[5].astype(dtype)
    out["p_xv2"] = b_xv[4].astype(dtype)
    out["p_xv2b"] = b_xv[5].astype(dtype)

    # query MLPs (node-level, standard): stack [4, ...] in the order
    # (node-knn hq, node-bond hq, pos-knn xq, pos-bond xq)
    qs = [_mlp_parts(nle["hq"]), _mlp_parts(nlb["hq"]),
          _mlp_parts(ple["xq"]), _mlp_parts(plb["xq"])]
    out["q_W0"] = cat([q[0][:, None] for q in qs], 1)       # [L,4,H,H]
    out["q_b0"] = cat([q[1][:, None] for q in qs], 1)
    out["q_ln_s"] = cat([q[2][:, None] for q in qs], 1)
    out["q_ln_b"] = cat([q[3][:, None] for q in qs], 1)
    out["q_W1"] = cat([q[4][:, None] for q in qs], 1)
    out["q_b1"] = cat([q[5][:, None] for q in qs], 1)

    bond = raw["bond_layer"]
    tkj = bond["tf_kj"]["kernel"]                           # [L,3H+20,Wt]
    out["t_Whb"] = tkj[:, :H].astype(dtype)
    out["t_Wr"] = tkj[:, H:H + 20].astype(dtype)
    out["t_Wn"] = cat([tkj[:, H + 20:2 * H + 20], tkj[:, 2 * H + 20:]], 2)
    out["t_b"] = bond["tf_kj"]["bias"].astype(dtype)
    out["t_Wji"] = bond["tf_ji"]["kernel"].astype(dtype)
    out["t_Wang"] = bond["tf_ang_w"].astype(dtype)
    out["t_ln_s"] = bond["tf_ln_scale"].astype(dtype)
    out["t_ln_b"] = bond["tf_ln_bias"].astype(dtype)
    tq = _mlp_parts(bond["tf_q"])
    out["tq_Whb"] = tq[0][:, :H].astype(dtype)
    out["tq_Wi"] = tq[0][:, H:].astype(dtype)
    out["tq_b0"] = tq[1].astype(dtype)
    out["tq_ln_s"] = tq[2].astype(dtype)
    out["tq_ln_b"] = tq[3].astype(dtype)
    # per-head LEADING layouts so the kernel's fori_loop over heads indexes
    # the major axis (static-shape dynamic_slice; buffers reused per step —
    # a python-unrolled head loop kept every head's temporaries live and
    # blew the scoped-VMEM stack)
    L = tq[5].shape[0]
    Wt_ = bond["tf_ln_scale"].shape[-1]
    n_heads_t = tq[5].shape[-1] // Wt_
    out["t_out_W"] = (bond["tf_out"]["kernel"].astype(dtype)
                      .reshape(L, n_heads_t, Wt_, H))       # [L,h,Wt,H]
    out["t_out_b"] = bond["tf_out"]["bias"].astype(dtype)
    out["tq_W1"] = (tq[4].astype(dtype)
                    .reshape(L, H, n_heads_t, Wt_)
                    .transpose(0, 2, 1, 3))                 # [L,h,H,Wt]
    out["tq_b1"] = tq[5].astype(dtype).reshape(L, n_heads_t, Wt_)
    # flat (w, a)-minor layouts for the batched 'xla2' driver: the query
    # projection becomes ONE [B*j*i, H] @ [H, Wt*heads] dot and the output
    # projection ONE [B*j*i, heads*Wt] @ [heads*Wt, H] dot (no head-major
    # 5-D einsums, which lower to convolutions + layout copies on TPU)
    out["tq_W1f"] = (tq[4].astype(dtype).reshape(L, H, n_heads_t, Wt_)
                     .transpose(0, 1, 3, 2).reshape(L, H, Wt_ * n_heads_t))
    out["tq_b1f"] = (tq[5].astype(dtype).reshape(L, n_heads_t, Wt_)
                     .transpose(0, 2, 1))                   # [L,Wt,heads]
    out["t_out_Wf"] = bond["tf_out"]["kernel"].astype(dtype)  # [L,a*Wt,H]

    offsets, _ = gaussian_smearing_offsets(fix_offset=True)
    L = raw["lin_node"]["bias"].shape[0]
    out["rbf_off"] = jnp.broadcast_to(
        jnp.asarray(offsets, dtype)[None], (L, len(offsets)))
    heads_n = raw["pos_layer_with_edge"]["xv"]["Dense_1"]["bias"].shape[-1]
    out["head_mask"] = jnp.broadcast_to(
        _head_mask(H, heads_n)[None], (L, H, heads_n)).astype(dtype)
    out["dire_W"] = raw["dire_embedding"]["kernel"].astype(dtype)  # [L,3,9]
    out["dire_b"] = raw["dire_embedding"]["bias"].astype(dtype)
    out["lin_W"] = raw["lin_node"]["kernel"].astype(dtype)
    out["lin_b"] = raw["lin_node"]["bias"].astype(dtype)

    # ---- merged operands for the batched ('xla2') driver ----------------
    # On this runtime per-iteration cost tracks executed-thunk count, and
    # every dot is a thunk — so all matmuls sharing an input tensor are
    # merged into ONE wide dot whose result is sliced (FLOPs are ~1%
    # utilized; thunks are the currency). dire_embedding is folded into the
    # edge first layer by associativity: dire9 @ e_W[84:] ==
    # dire3 @ (dire_W @ e_W[84:]).
    fe_base = fe - 9  # non-dire edge-feature rows (84 at flagship fe=93)
    out["em_W"] = jnp.concatenate(
        [out["e_W"][:, :fe_base],
         jnp.einsum("lde,leh->ldh", out["dire_W"], out["e_W"][:, fe_base:])],
        1)
    out["em_b"] = out["e_b"] + jnp.einsum("le,leh->lh", out["dire_b"],
                                          out["e_W"][:, fe_base:])
    # everything multiplying OLD h (h_l consumers computed on all N rows
    # and row-sliced after — wasted phore-row FLOPs are free here)
    out["h_mega"] = jnp.concatenate(
        [out["e_Wn_h"], out["q_W0"][:, 0], out["q_W0"][:, 1],
         out["b_Wn"], out["t_Wn"], out["tq_Wi"]], -1)  # [L,H,11H+2Wt]
    # everything multiplying NEW h
    out["nh_mega"] = jnp.concatenate(
        [out["e_Wn_nh"], out["q_W0"][:, 2], out["q_W0"][:, 3],
         out["p_Wn"]], -1)                             # [L,H,10H]
    # everything multiplying OLD hb (stage A kv + stage B kj/q)
    out["hb_mega"] = jnp.concatenate(
        [out["b_W"], out["t_Whb"], out["tq_Whb"]], -1)  # [L,H,3H+Wt]
    # both RBF projections of the dense ligand distance grid
    out["r_mega"] = jnp.concatenate([out["t_Wr"], out["t_Wji"]], -1)
    # stage-C k/v second layers, stacked like e_k2/b_k2 (the v heads are
    # zero-padded to H columns so one batched dot serves both halves)
    pad_v = ((0, 0), (0, 0), (0, H - heads_n))
    out["x_k2"] = jnp.concatenate(
        [out["e_xk2"][:, None], jnp.pad(out["e_xv2"], pad_v)[:, None]], 1)
    out["x_b2"] = jnp.concatenate(
        [out["e_xk2b"][:, None],
         jnp.pad(out["e_xv2b"], ((0, 0), (0, H - heads_n)))[:, None]], 1)
    out["p_k2m"] = jnp.concatenate(
        [out["p_xk2"][:, None], jnp.pad(out["p_xv2"], pad_v)[:, None]], 1)
    out["p_b2m"] = jnp.concatenate(
        [out["p_xk2b"][:, None],
         jnp.pad(out["p_xv2b"], ((0, 0), (0, H - heads_n)))[:, None]], 1)
    return out


# --------------------------------------------------------------------------
# kernel-side math helpers (pure jnp on values)
# --------------------------------------------------------------------------

def _ln(x, scale, bias):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu)
    return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * scale + bias


def _softmax_masked(scores, maskf, axis):
    scores = scores + (1.0 - maskf) * NEG_INF
    m = jnp.max(scores, axis=axis, keepdims=True)
    e = jnp.exp(scores - jax.lax.stop_gradient(m)) * maskf
    # Denominator floor is 1.0, NOT a tiny eps: any row with >=1 valid lane
    # has its argmax lane at exp(0) = 1, so sum_e >= 1 and the clamp is
    # inactive (bit-identical softmax); a fully-masked row (padded node /
    # empty triplet set) gets denom 1 -> output 0 with a finite backward.
    # With eps=1e-30 the division's VJP forms 1/denom^2 = 1e60 = inf in
    # f32, and inf * (e = 0) = NaN — which poisoned every upstream weight
    # gradient when training through the fused stacks (round-5 NaN hunt;
    # pinned by tests/test_layer_stack.py::test_xla2_grad_finite_padded).
    return e / jnp.maximum(jnp.sum(e, axis=axis, keepdims=True), 1.0)


def _reduce0(x, op):
    """Unrolled log-depth tree reduction over the (static, small) leading
    axis — the Mosaic backend crashes on >2D leading-axis reduce at these
    shapes, and a linear chain serializes the scheduler."""
    vals = [x[k] for k in range(x.shape[0])]
    while len(vals) > 1:
        nxt = [op(vals[i], vals[i + 1]) for i in range(0, len(vals) - 1, 2)]
        if len(vals) % 2:
            nxt.append(vals[-1])
        vals = nxt
    return vals[0]


def _softmax0_unrolled(scores, maskf):
    """Masked softmax over the leading axis via unrolled slice ops."""
    s = scores + (1.0 - maskf) * NEG_INF
    m = jax.lax.stop_gradient(_reduce0(s, jnp.maximum))
    e = jnp.exp(s - m[None]) * maskf
    # floor 1.0 for the same reason as _softmax_masked: exact on valid
    # rows (sum_e >= 1), finite VJP on fully-masked rows (1e-30 made the
    # division backward form inf * 0 = NaN)
    denom = jnp.maximum(_reduce0(e, jnp.add), 1.0)
    return e / denom[None]


# --------------------------------------------------------------------------
# single-layer math on packed weights (values, one graph, no batch dim)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class StackDims:
    NP: int
    NL: int
    K: int      # block knn width
    K8: int     # triplet knn width
    H: int
    heads: int
    Wt: int
    num_ang: int = 3

    @property
    def N(self):
        return self.NP + self.NL


def _qmlp(h, W0, b0, s, b, W1, b1):
    z = h @ W0 + b0
    z = jax.nn.relu(_ln(z, s, b))
    return z @ W1 + b1


def _head_mask(H, heads):
    """[H, heads] selector: column h is 1 on head h's feature block."""
    dh = H // heads
    return jnp.asarray(np.kron(np.eye(heads, dtype=np.float32),
                               np.ones((dh, 1), np.float32)))


def _atan2_nonneg(y, x):
    """Polynomial atan2 for y >= 0 (Pallas TPU has no atan2 primitive);
    max error ~1e-5 rad — shared with ops/pallas_triplet.py."""
    ax = jnp.abs(x)
    mx = jnp.maximum(y, ax)
    mn = jnp.minimum(y, ax)
    z = mn / jnp.maximum(mx, 1e-30)
    tt = z * z
    pp = z * (0.99997726 + tt * (-0.33262347 + tt * (0.19354346 + tt * (
        -0.11643287 + tt * (0.05265332 + tt * -0.01172120)))))
    r = jnp.where(y > ax, np.float32(np.pi / 2) - pp, pp)
    return jnp.where(x < 0, np.float32(np.pi) - r, r)


def _knn_edge_prefeat(w, x, t, d: StackDims, lo: int, hi: int):
    """Edge-feature first-layer pre-activation columns [lo:hi) of the packed
    4H-wide fused matmul, recomputed from tables + positions.

    Column-slicing the weight operand before the matmul is exact
    ((A @ W)[:, c] == A @ W[:, c]), so stage A (node cols [0, 2H)) and
    stage C (pos cols [2H, 4H)) computing their own halves is numerically
    identical to materializing the full e_pre4 — while keeping the 4 MB
    [N*K, 4H] intermediate out of VMEM/HBM entirely (it was the scoped-
    VMEM OOM at B=16 through the double-buffered stage pipeline).

    Returns (e_pre [N*K, hi-lo], rel [N*K, 3]).
    """
    N, NL, NP, K = d.N, d.NL, d.NP, d.K
    _, coeff = gaussian_smearing_offsets(fix_offset=True)
    offsets = w["rbf_off"]                         # [20]
    nbr_oh = t["nbr_onehot"]                       # [N*K, N]

    # NOTE (Mosaic): never reshape a lazily-broadcast value — broadcasts
    # happen implicitly inside arithmetic at rank 3, and only materialized
    # results get flat reshapes.
    x_nbr = nbr_oh @ x                             # [N*K,3]
    rel = (x[:, None, :] - x_nbr.reshape(N, K, 3)).reshape(N * K, 3)
    d2 = jnp.sum(rel * rel, -1, keepdims=True)     # [N*K,1]
    dist = jnp.sqrt(d2 + 1e-12)
    rbf = jnp.exp(coeff * jnp.square(dist - offsets[None, :]))  # [N*K,20]
    etype = t["edge_type"]                         # [N*K,4]

    pos_l = x[NP:]
    neib = t["lig3_w"] @ pos_l - pos_l             # [NL,3]
    comb = jnp.concatenate([t["phore_norm"], neib], 0)      # [N,3]
    v1 = (nbr_oh @ comb).reshape(N, K, 3)
    v2 = comb[:, None, :]                          # broadcast in ops below
    v3 = -rel.reshape(N, K, 3)
    dire3 = jnp.concatenate(
        [jnp.sum(v1 * v2, -1, keepdims=True),
         jnp.sum(v1 * v3, -1, keepdims=True),
         jnp.sum(v2 * v3 + jnp.zeros_like(v1), -1, keepdims=True)], -1
        ).reshape(N * K, 3)
    dire9 = dire3 @ w["dire_W"] + w["dire_b"]

    # edge_feat = [etype x rbf (type-major 80), etype 4, dire 9]; applied
    # decomposed (no [N*K,93] concat, no lane-splitting reshape):
    #   e_pre = sum_t etype_t * (rbf @ W_o_t) + etype @ W_t + dire9 @ W_d
    e_pre = (w["e_b"][lo:hi] + etype @ w["e_W"][80:84, lo:hi]
             + dire9 @ w["e_W"][84:, lo:hi])
    for t4 in range(4):
        e_pre = e_pre + etype[:, t4:t4 + 1] * (
            rbf @ w["e_W"][t4 * 20:(t4 + 1) * 20, lo:hi])
    return e_pre, rel


def _stage_node(w, h, x, hb, t, d: StackDims):
    """Stage A: edge features + knn/bond node updates -> new_h.

    w: dict of THIS layer's packed weights (no leading L).
    h [N,H] f32; x [N,3]; hb [NL,NL,H]; t: tables dict for one graph
    (plus 'edge_type' [N*K,4], 'e_w' [N*K,1], 'phore_norm' [NP,3]).
    """
    N, NL, NP, K, K8 = d.N, d.NL, d.NP, d.K, d.K8
    H, heads, Wt = d.H, d.heads, d.Wt
    dh = H // heads
    f32 = jnp.float32

    nbr_oh = t["nbr_onehot"]                       # [N*K, N]
    nbr_mask = t["nbr_mask"]                       # [N,K,1] float
    e_w = t["e_w"]                                 # [N*K,1]

    # ---- fused knn first layers, node k/v columns [0, 2H) ----
    e_pre2, _rel = _knn_edge_prefeat(w, x, t, d, 0, 2 * H)
    nproj_h = h @ w["e_Wn_h"]                      # [N,4H]
    j_h = nbr_oh @ nproj_h[:, 2 * H:]
    pre_kv = ((e_pre2 + j_h).reshape(N, K, 2 * H)
              + jnp.expand_dims(nproj_h[:, :2 * H], 1)
              ).reshape(N * K, 2 * H)
    k_n = jax.nn.relu(_ln(pre_kv[:, :H], w["e_ln_s"][0], w["e_ln_b"][0]))
    v_n = jax.nn.relu(_ln(pre_kv[:, H:], w["e_ln_s"][1], w["e_ln_b"][1]))
    k_n = k_n @ w["e_k2"][0] + w["e_b2"][0]
    v_n = (v_n @ w["e_k2"][1] + w["e_b2"][1]) * e_w
    q_n = _qmlp(h, w["q_W0"][0], w["q_b0"][0], w["q_ln_s"][0],
                w["q_ln_b"][0], w["q_W1"][0], w["q_b1"][0])

    # attention layouts put the softmax axis LEADING: middle (sublane-dim)
    # reductions crash the Mosaic backend at these shapes
    hm = w["head_mask"]                            # [H, heads]
    qk = (k_n.reshape(N, K, H) * q_n[:, None, :]).reshape(N * K, H)
    scores = (qk @ hm / float(np.sqrt(dh))
              ).reshape(N, K, heads).transpose(1, 0, 2)     # [K,N,heads]
    alpha = _softmax0_unrolled(scores, nbr_mask.transpose(1, 0, 2))
    alpha_h = (alpha.transpose(1, 0, 2).reshape(N * K, heads) @ hm.T)
    out_e = _reduce0((alpha_h * v_n).reshape(N, K, H).transpose(1, 0, 2),
                     jnp.add)

    # ---- dense bond-grid node update (ligand block) ----
    h_l = h[NP:]
    hb_flat = hb.reshape(NL * NL, H)
    b_pre = hb_flat @ w["b_W"] + w["b_b"]          # [NL*NL,2H]
    nproj_b = h_l @ w["b_Wn"]                      # [NL,4H]
    pre_b = (b_pre.reshape(NL, NL, 2 * H)
             + jnp.expand_dims(nproj_b[:, :2 * H], 0)   # h_i = dst (axis 1)
             + jnp.expand_dims(nproj_b[:, 2 * H:], 1))  # h_j = src (axis 0)
    pre_b = pre_b.reshape(NL * NL, 2 * H)
    k_b = jax.nn.relu(_ln(pre_b[:, :H], w["b_ln_s"][0], w["b_ln_b"][0]))
    v_b = jax.nn.relu(_ln(pre_b[:, H:], w["b_ln_s"][1], w["b_ln_b"][1]))
    k_b = k_b @ w["b_k2"][0] + w["b_b2"][0]                 # [NL*NL,H]
    v_b = v_b @ w["b_k2"][1] + w["b_b2"][1]
    q_b = _qmlp(h_l, w["q_W0"][1], w["q_b0"][1], w["q_ln_s"][1],
                w["q_ln_b"][1], w["q_W1"][1], w["q_b1"][1])
    qkb = (k_b.reshape(NL, NL, H) * q_b[None, :, :]).reshape(NL * NL, H)
    sc_b = (qkb @ hm / float(np.sqrt(dh))).reshape(NL, NL, heads)  # [s,d,h]
    al_b = _softmax0_unrolled(sc_b, t["pair_mask"])
    al_b_h = al_b.reshape(NL * NL, heads) @ hm.T
    out_b_l = _reduce0((al_b_h * v_b).reshape(NL, NL, H), jnp.add)
    out_b = jnp.concatenate([jnp.zeros((NP, H), h.dtype), out_b_l], 0)

    new_h = h + (out_e + out_b) @ w["lin_W"] + w["lin_b"]
    return new_h


def _stage_triplet_pre(w, h, x, hb, t, d: StackDims):
    """Stage B1: head-independent triplet features.

    Returns (pre_t [K8,NL,NL,Wt], q_z [NL*NL,H]). Split from the head
    attention so each half fits the 16 MB scoped VMEM (the combined stage
    peaked at 21 MB at B=16/NL=32)."""
    N, NL, NP, K8 = d.N, d.NL, d.NP, d.K8
    H, heads, Wt = d.H, d.heads, d.Wt
    _, coeff = gaussian_smearing_offsets(fix_offset=True)
    offsets = w["rbf_off"]
    bands = [float(f) for f in angular_encoding_freq_bands(d.num_ang)]
    pos_l = x[NP:]
    h_l = h[NP:]
    hb_flat = hb.reshape(NL * NL, H)

    rel_l = pos_l[:, None, :] - pos_l[None, :, :]           # rel[x,i]=x-i
    dist_l = jnp.sqrt(jnp.sum(rel_l * rel_l, -1, keepdims=True) + 1e-12)
    r_feat = jnp.exp(coeff * jnp.square(dist_l - offsets[None, None, :]))
    a_kj = (hb_flat @ w["t_Whb"]
            + r_feat.reshape(NL * NL, 20) @ w["t_Wr"]
            ).reshape(NL, NL, Wt) + w["t_b"]
    npj_k = h_l @ w["t_Wn"][:, :Wt]                         # [NL,Wt]
    npj_j = h_l @ w["t_Wn"][:, Wt:]
    a_kj = a_kj + npj_k[:, None, :] + npj_j[None, :, :]     # (k,j)
    a_ji = (r_feat.reshape(NL * NL, 20) @ w["t_Wji"]).reshape(NL, NL, Wt)

    q_pre = (hb_flat @ w["tq_Whb"]).reshape(NL, NL, H) \
        + (h_l @ w["tq_Wi"])[None, :, :] + w["tq_b0"]       # (j,i)
    q_z = jax.nn.relu(_ln(q_pre, w["tq_ln_s"], w["tq_ln_b"])
                      ).reshape(NL * NL, H)

    # per-K8-slice construction: only [NL,NL,*] temporaries are live at any
    # point (the full-size [K8,NL,NL,*] chain — rel_ki/dot/cross/angle/enc/
    # a_ang/LN temps — peaked the Mosaic scoped-VMEM stack at 27 MB). The
    # bond-grid gather a_kj[trip_idx[j,k], j] is a leading-axis masked
    # reduce against the small [j,K8,m] one-hot (a flattened [NL*K8,NL*NL]
    # selection matmul costs another 1 MB of VMEM input window). Slices are
    # returned as a LIST so the Pallas kernel writes each straight into the
    # output ref (no stacked [K8,...] temp); the XLA path stacks them.
    selr3 = t["trip_sel_row"].reshape(NL, K8, NL)
    njsq = jnp.sum(rel_l * rel_l, -1)                       # [j,i]
    slices = []
    for k in range(K8):
        mk = selr3[:, k, :].T                               # [m,j]
        a_kj_j_k = _reduce0(mk[:, :, None] * a_kj, jnp.add)  # [j,Wt]
        pos_k_k = selr3[:, k, :] @ pos_l                    # [j,3]
        rel_ki_k = pos_k_k[:, None, :] - pos_l[None, :, :]  # [j,i,3]
        dot_k = jnp.sum(rel_l * rel_ki_k, -1)               # [j,i]
        nksq_k = jnp.sum(rel_ki_k * rel_ki_k, -1)
        cross_k = jnp.sqrt(jnp.clip(njsq * nksq_k - dot_k * dot_k,
                                    CROSS_SQ_EPS, None))
        angle_k = _atan2_nonneg(cross_k, dot_k)
        enc_k = jnp.concatenate(
            [angle_k[..., None]]
            + [jnp.sin(angle_k * f)[..., None] for f in bands]
            + [jnp.cos(angle_k * f)[..., None] for f in bands], -1)
        a_ang_k = enc_k @ w["t_Wang"]                       # [j,i,Wt]
        pre_k = a_kj_j_k[:, None, :] + a_ji + a_ang_k
        slices.append(jax.nn.relu(_ln(pre_k, w["t_ln_s"], w["t_ln_b"])))
    return slices, q_z


def _stage_node_pre(w, h, x, hb, t, d: StackDims):
    """Merged Stage A+B1: `_stage_node` + `_stage_triplet_pre` in one
    dispatch (fused_stack 'pallas3'). Returns (new_h, pre_t slices, q_z)."""
    new_h = _stage_node(w, h, x, hb, t, d)
    slices, q_z = _stage_triplet_pre(w, h, x, hb, t, d)
    return new_h, slices, q_z


def _stage_triplet_att(w, hb, pt, q_z, t, d: StackDims):
    """Stage B2: per-head triplet attention on precomputed features.

    `pt` is a callable k -> pre_t[k] ([NL,NL,Wt]): in the Pallas kernel it
    loads slices straight from the input *ref* so the full [K8,NL,NL,Wt]
    tensor never sits on the VMEM stack; scores and the softmax-weighted
    pool are likewise built slice-wise with a linear accumulator (the
    full-size products were the last ~2.7 MB over the 16 MB scoped limit).

    q/tf_out weights packed head-leading, iterated with fori_loop so each
    head's temporaries are REUSED (a python-unrolled loop kept 16 heads'
    buffers live -> 35M scoped-VMEM stack). In the Pallas kernel the
    per-head stacks (tq_W1/tq_b1/t_out_W) stay *refs* indexed by the loop
    counter — `value[i]` with traced `i` is a gather, which Mosaic rejects.
    Per head: no [.,heads,Wt] lane reshape, no multi-batch einsum;
    softmax/pool reduce over the LEADING K8 axis."""
    NL, H, heads, Wt, K8 = d.NL, d.H, d.heads, d.Wt, d.K8
    f32 = jnp.float32
    inv_sw = 1.0 / float(np.sqrt(Wt))
    trip_valid = t["trip_valid"]                            # [K8,j,i]

    def head_body(hh, t_acc):
        q_h = (q_z @ w["tq_W1"][hh] + w["tq_b1"][hh]).reshape(NL, NL, Wt)
        sc_h = jnp.stack([jnp.sum(pt(k) * q_h, -1) for k in range(K8)],
                         0) * inv_sw                        # [K8,j,i]
        al_h = _softmax0_unrolled(sc_h, trip_valid)
        pooled = al_h[0][..., None] * pt(0)
        for k in range(1, K8):
            pooled = pooled + al_h[k][..., None] * pt(k)    # [NL,NL,Wt]
        return t_acc + pooled.reshape(NL * NL, Wt) @ w["t_out_W"][hh]

    t_acc = jax.lax.fori_loop(0, heads, head_body,
                              jnp.zeros((NL * NL, H), f32))
    t_out = (t_acc + w["t_out_b"]).reshape(NL, NL, H)
    return hb + t_out


def _stage_triplet(w, h, x, hb, t, d: StackDims):
    """Stage B: factorized kNN triplet bond update -> hb_new (uses OLD h)."""
    slices, q_z = _stage_triplet_pre(w, h, x, hb, t, d)
    return _stage_triplet_att(w, hb, lambda k: slices[k], q_z, t, d)


def _stage_pos(w, new_h, x, hb_new, t, d: StackDims):
    """Stage C: knn + bond-grid position updates -> x_new."""
    N, NL, NP, K = d.N, d.NL, d.NP, d.K
    H, heads = d.H, d.heads
    dh = H // heads
    nbr_oh = t["nbr_onehot"]
    nbr_mask = t["nbr_mask"]
    e_w = t["e_w"]
    hm = w["head_mask"]
    pos_l = x[NP:]

    # ---- pos update via knn edges (uses new_h); edge pre-features
    # recomputed for the pos k/v columns [2H, 4H) — see _knn_edge_prefeat
    e_pre2, rel = _knn_edge_prefeat(w, x, t, d, 2 * H, 4 * H)
    nproj_x = new_h @ w["e_Wn_nh"]
    j_x = nbr_oh @ nproj_x[:, 2 * H:]
    pre_x = ((e_pre2 + j_x).reshape(N, K, 2 * H)
             + jnp.expand_dims(nproj_x[:, :2 * H], 1)
             ).reshape(N * K, 2 * H)
    xk = jax.nn.relu(_ln(pre_x[:, :H], w["e_ln_s"][2], w["e_ln_b"][2]))
    xv = jax.nn.relu(_ln(pre_x[:, H:], w["e_ln_s"][3], w["e_ln_b"][3]))
    xk = xk @ w["e_xk2"] + w["e_xk2b"]                      # [N*K,H]
    xv = (xv @ w["e_xv2"] + w["e_xv2b"]) * e_w              # [N*K,heads]
    xq = _qmlp(new_h, w["q_W0"][2], w["q_b0"][2], w["q_ln_s"][2],
               w["q_ln_b"][2], w["q_W1"][2], w["q_b1"][2])
    xqk = (xk.reshape(N, K, H) * xq[:, None, :]).reshape(N * K, H)
    sc_x = (xqk @ hm / float(np.sqrt(dh))
            ).reshape(N, K, heads).transpose(1, 0, 2)       # [K,N,heads]
    al_x = _softmax0_unrolled(sc_x, nbr_mask.transpose(1, 0, 2))
    # mean over heads folds into the edge weight: w_e = sum_h al*xv / heads
    w_e = jnp.sum(al_x * xv.reshape(N, K, heads).transpose(1, 0, 2), -1,
                  keepdims=True) / heads                    # [K,N,1]
    dx_edge = _reduce0(w_e * rel.reshape(N, K, 3).transpose(1, 0, 2),
                       jnp.add)                             # [N,3]

    # ---- pos update via bond grid (uses new_h, new hb) ----
    nh_l = new_h[NP:]
    hbn_flat = hb_new.reshape(NL * NL, H)
    pp = hbn_flat @ w["p_W"] + w["p_b"]
    nproj_p = nh_l @ w["p_Wn"]
    pre_p = (pp.reshape(NL, NL, 2 * H)
             + jnp.expand_dims(nproj_p[:, :2 * H], 0)
             + jnp.expand_dims(nproj_p[:, 2 * H:], 1))
    pre_p = pre_p.reshape(NL * NL, 2 * H)
    pk = jax.nn.relu(_ln(pre_p[:, :H], w["p_ln_s"][0], w["p_ln_b"][0]))
    pv = jax.nn.relu(_ln(pre_p[:, H:], w["p_ln_s"][1], w["p_ln_b"][1]))
    pk = pk @ w["p_xk2"] + w["p_xk2b"]                      # [NL*NL,H]
    pv = pv @ w["p_xv2"] + w["p_xv2b"]                      # [NL*NL,heads]
    pq = _qmlp(nh_l, w["q_W0"][3], w["q_b0"][3], w["q_ln_s"][3],
               w["q_ln_b"][3], w["q_W1"][3], w["q_b1"][3])
    pqk = (pk.reshape(NL, NL, H) * pq[None, :, :]).reshape(NL * NL, H)
    sc_p = (pqk @ hm / float(np.sqrt(dh))).reshape(NL, NL, heads)
    al_p = _softmax0_unrolled(sc_p, t["pair_mask"])
    rel_bond = pos_l[None, :, :] - pos_l[:, None, :]        # [s,d]=d-s
    w_p = jnp.sum(al_p * pv.reshape(NL, NL, heads), -1,
                  keepdims=True) / heads                    # [s,d,1]
    dx_bond_l = _reduce0(w_p * rel_bond, jnp.add)           # [d,3]

    dx = dx_edge + jnp.concatenate(
        [jnp.zeros((NP, 3), x.dtype), dx_bond_l], 0)
    lig_mask = jnp.concatenate(
        [jnp.zeros((NP, 1), x.dtype), t["mask_l"]], 0)      # [N,1]
    return x + dx * lig_mask


def _layer_math(w, h, x, hb, t, d: StackDims):
    """One attention layer on packed weights = the three stages composed."""
    new_h = _stage_node(w, h, x, hb, t, d)
    hb_new = _stage_triplet(w, h, x, hb, t, d)
    x_new = _stage_pos(w, new_h, x, hb_new, t, d)
    return new_h, x_new, hb_new


# --------------------------------------------------------------------------
# XLA driver: vmap over batch, lax.scan over layers (packing-parity path,
# also the fallback when the Pallas kernel is unavailable)
# --------------------------------------------------------------------------

def layer_stack_xla(packed: Dict[str, jnp.ndarray], h, x, hb,
                    tables: Dict[str, jnp.ndarray], dims: StackDims):
    """h [B,N,H]; x [B,N,3]; hb [B,NL,NL,H]; tables with leading batch dim
    (incl. 'edge_type' [B,N*K,4], 'e_w' [B,N,K], 'phore_norm' [B,NP,3])."""

    def per_graph(h_g, x_g, hb_g, tbl):
        def body(carry, wl):
            return _layer_math(wl, *carry, tbl, dims), None

        (h_o, x_o, hb_o), _ = jax.lax.scan(
            body, (h_g, x_g, hb_g), packed)
        return h_o, x_o, hb_o

    return jax.vmap(per_graph, in_axes=(0, 0, 0, 0))(h, x, hb, tables)


# --------------------------------------------------------------------------
# Batched XLA driver ('xla2'): whole-batch einsum formulation
#
# The per-graph stage functions above are shaped by Mosaic's constraints
# (unrolled leading-axis softmaxes, per-K8 slice loops, fori over heads,
# per-stage recomputation of the shared edge pre-features). None of those
# constraints bind in XLA — but vmapping the Mosaic-shaped code (the 'xla'
# driver) inherits its op inflation: ~80 fusions per layer, and on a
# runtime whose per-iteration cost tracks executed-thunk count (round-4
# clean-chip ladder, BASELINE.md) the op count IS the time. This driver
# re-states the same math over [B, ...] tensors with single einsums over
# heads/K8 and jax.nn-style masked softmaxes, and computes the [B,N*K,4H]
# knn edge pre-features ONCE per layer (shared between the node and pos
# stages; splitting it was a scoped-VMEM necessity, not math).
#
# Parity oracle: layer_stack_xla (tests/test_layer_stack.py). The only
# numeric divergence is atan2: jnp.arctan2 here vs the Mosaic polynomial
# (~1e-5 rad) in the per-graph path.
# --------------------------------------------------------------------------

def _knn_edge_prefeat_b(w, x, t, d: StackDims):
    """Batched knn edge features, ALL 4H columns at once.

    Returns (e_pre4 [B,N*K,4H], rel [B,N,K,3]). The x- and comb-gathers
    share one nbr_onehot dot; the dire projection is pre-folded into the
    87-wide merged first layer (em_W)."""
    B = x.shape[0]
    N, NL, NP, K = d.N, d.NL, d.NP, d.K
    _, coeff = gaussian_smearing_offsets(fix_offset=True)
    offsets = w["rbf_off"]
    nbr_oh = t["nbr_onehot"]                                # [B,N*K,N]

    pos_l = x[:, NP:]
    neib = t["lig3_w"] @ pos_l - pos_l                      # [B,NL,3]
    comb = jnp.concatenate([t["phore_norm"], neib], 1)      # [B,N,3]
    g = (nbr_oh @ jnp.concatenate([x, comb], -1)).reshape(B, N, K, 6)
    x_nbr, v1 = g[..., :3], g[..., 3:]
    rel = x[:, :, None, :] - x_nbr                          # [B,N,K,3]
    relf = rel.reshape(B, N * K, 3)
    dist = jnp.sqrt(jnp.sum(relf * relf, -1, keepdims=True) + 1e-12)
    rbf = jnp.exp(coeff * jnp.square(dist - offsets[None, None, :]))
    etype = t["edge_type"]                                  # [B,N*K,4]

    v2 = comb[:, :, None, :]
    v3 = -rel
    dire3 = jnp.stack(
        [jnp.sum(v1 * v2, -1), jnp.sum(v1 * v3, -1), jnp.sum(v2 * v3, -1)],
        -1).reshape(B, N * K, 3)

    # edge_feat = [etype (x) rbf (type-major 80) | etype 4 | dire3] @ em_W
    trbf = (etype[..., None] * rbf[:, :, None, :]).reshape(B, N * K, 80)
    feat = jnp.concatenate([trbf, etype, dire3], -1)        # [B,N*K,87]
    feat = feat.astype(w["em_W"].dtype)
    return feat @ w["em_W"] + w["em_b"], rel


def _kv_stacked(pre, ln_s2, ln_b2, W2, b2):
    """Paired k/v second layers as ONE batched dot.

    pre [..., 2H] (first H = k half), ln params [2, H], W2 [2, H, G],
    b2 [2, G]. Returns [..., 2, G] (slot 0 = k, slot 1 = v)."""
    pre2 = pre.reshape(pre.shape[:-1] + (2, pre.shape[-1] // 2))
    z = jax.nn.relu(_ln(pre2, ln_s2, ln_b2))
    return jnp.einsum("...th,thg->...tg", z, W2) + b2


def _q_stacked(z2, ln_s2, ln_b2, W1_2, b1_2):
    """Paired query-MLP tails (post first-layer) as ONE batched dot.

    z2 [..., 2, H] = the two q first-layer outputs (bias already added),
    ln/W1/b1 stacked [2, ...]. Returns [..., 2, H]."""
    z = jax.nn.relu(_ln(z2, ln_s2, ln_b2))
    return jnp.einsum("...th,thg->...tg", z, W1_2) + b1_2


# measurement-only ablation switch (scripts/stage_ablation.py): a frozenset
# of stage names whose work _layer_math_batched skips at TRACE time. Never
# set outside attribution experiments.
_ABLATE_BATCHED: frozenset = frozenset()


def _layer_math_batched(w, h, x, hb, t, d: StackDims):
    """One attention layer, whole batch: h [B,N,H], x [B,N,3],
    hb [B,NL,NL,H] -> (new_h, x_new, hb_new). Same math as _layer_math.

    Mixed precision: h/hb and the packed weights may be bfloat16 while x
    (geometry) stays float32. Geometry-derived features are cast to the
    weight dtype at the matmul boundary; softmaxes run in f32 (promotion
    via the f32 mask term); position increments accumulate in f32."""
    B = h.shape[0]
    N, NL, NP, K, K8 = d.N, d.NL, d.NP, d.K, d.K8
    H, heads, Wt = d.H, d.heads, d.Wt
    dh = H // heads
    wdt = h.dtype
    inv_sd = 1.0 / float(np.sqrt(dh))
    nbr_oh = t["nbr_onehot"]                                # [B,N*K,N]
    # exact bf16 copies of the 0/1 selection tables for the h-path matmuls
    noh_w = t.get("nbr_onehot_w", nbr_oh)
    nbr_mask = t["nbr_mask"]                                # [B,N,K,1]
    e_w = t["e_w"].astype(wdt)                              # [B,N*K,1]

    if "prefeat" in _ABLATE_BATCHED:
        e_pre4 = jnp.zeros((B, N * K, 4 * H), wdt)
        rel = jnp.zeros((B, N, K, 3), jnp.float32)
    else:
        e_pre4, rel = _knn_edge_prefeat_b(w, x, t, d)       # [B,N*K,4H]

    # ---- stage A: node update (knn edges + dense bond grid) ----------
    # ONE mega-dot for every consumer of old h (node-knn projections,
    # both q first layers, bond projections, triplet kj/q projections);
    # h_l consumers are computed on all N rows and row-sliced.
    hm = h @ w["h_mega"]                        # [B,N,11H+2Wt]
    # ONE mega-dot for every consumer of old hb (bond kv first layer,
    # triplet kj and q projections)
    hbm = hb @ w["hb_mega"]                     # [B,s,d,3H+Wt]
    if "stageA" in _ABLATE_BATCHED:
        new_h = h
        q01 = jnp.zeros((B, N, 2, H), wdt)
    else:
        new_h, q01 = _stage_a(w, h, hm, hbm, noh_w, e_pre4, e_w, t, d)

    # ---- stage B: factorized kNN triplet bond update (uses OLD h) ----
    if "stageB" in _ABLATE_BATCHED:
        hb_new = hb
    else:
        hb_new = hb + _stage_b(w, hm, hbm, x, t, d)

    # ---- stage C: position update (uses new_h, new hb) ---------------
    if "stageC" in _ABLATE_BATCHED:
        x_new = x
    else:
        x_new = _stage_c(w, new_h, x, hb_new, noh_w, e_pre4, e_w, rel,
                         t, d)
    return new_h, x_new, hb_new


def _stage_a(w, h, hm, hbm, noh_w, e_pre4, e_w, t, d: StackDims):
    B = h.shape[0]
    N, NL, NP, K = d.N, d.NL, d.NP, d.K
    H, heads = d.H, d.heads
    dh = H // heads
    wdt = h.dtype
    inv_sd = 1.0 / float(np.sqrt(dh))
    nbr_mask = t["nbr_mask"]
    nproj_h = hm[..., :4 * H]
    j_h = noh_w @ nproj_h[..., 2 * H:]
    pre_kv = ((e_pre4[..., :2 * H] + j_h).reshape(B, N, K, 2 * H)
              + nproj_h[:, :, None, :2 * H])
    kv_n = _kv_stacked(pre_kv, w["e_ln_s"][0:2], w["e_ln_b"][0:2],
                       w["e_k2"], w["e_b2"])                # [B,N,K,2,H]
    k_n = kv_n[..., 0, :]
    v_n = kv_n[..., 1, :] * e_w.reshape(B, N, K, 1)
    q01_pre = hm[..., 4 * H:6 * H].reshape(B, N, 2, H) + w["q_b0"][0:2]
    q01 = _q_stacked(q01_pre, w["q_ln_s"][0:2], w["q_ln_b"][0:2],
                     w["q_W1"][0:2], w["q_b1"][0:2])        # [B,N,2,H]
    q_n = q01[:, :, 0]
    sc = jnp.sum(k_n.reshape(B, N, K, heads, dh)
                 * q_n.reshape(B, N, 1, heads, dh), -1) * inv_sd
    al = _softmax_masked(sc, nbr_mask, 2)                   # [B,N,K,heads]
    out_e = jnp.sum(al[..., None] * v_n.reshape(B, N, K, heads, dh),
                    2).reshape(B, N, H)

    b_pre = hbm[..., :2 * H] + w["b_b"]                     # [B,s,d,2H]
    nproj_b = hm[:, NP:, 6 * H:10 * H]                      # [B,NL,4H]
    pre_b = (b_pre + nproj_b[:, None, :, :2 * H]            # h_i = dst
             + nproj_b[:, :, None, 2 * H:])                 # h_j = src
    kv_b = _kv_stacked(pre_b, w["b_ln_s"], w["b_ln_b"],
                       w["b_k2"], w["b_b2"])                # [B,s,d,2,H]
    k_b, v_b = kv_b[..., 0, :], kv_b[..., 1, :]
    q_b = q01[:, NP:, 1]
    sc_b = jnp.sum(k_b.reshape(B, NL, NL, heads, dh)
                   * q_b.reshape(B, 1, NL, heads, dh), -1) * inv_sd
    al_b = _softmax_masked(sc_b, t["pair_mask"], 1)         # [B,s,d,heads]
    out_b_l = jnp.sum(al_b[..., None]
                      * v_b.reshape(B, NL, NL, heads, dh), 1
                      ).reshape(B, NL, H)
    out_b = jnp.concatenate(
        [jnp.zeros((B, NP, H), out_b_l.dtype), out_b_l], 1)
    new_h = h + (out_e + out_b).astype(wdt) @ w["lin_W"] + w["lin_b"]
    return new_h, q01


def _stage_b(w, hm, hbm, x, t, d: StackDims):
    """Factorized kNN triplet bond update (uses OLD h via hm/hbm).
    Returns the hb increment [B,NL,NL,H]."""
    B = hm.shape[0]
    NL, NP, K8 = d.NL, d.NP, d.K8
    H, heads, Wt = d.H, d.heads, d.Wt
    wdt = hm.dtype
    _, coeff = gaussian_smearing_offsets(fix_offset=True)
    bands = [float(f) for f in angular_encoding_freq_bands(d.num_ang)]
    pos_l = x[:, NP:]
    rel_l = pos_l[:, :, None, :] - pos_l[:, None, :, :]     # [B,x,i,3]
    r_feat = jnp.exp(coeff * jnp.square(
        jnp.sqrt(jnp.sum(rel_l * rel_l, -1, keepdims=True) + 1e-12)
        - w["rbf_off"][None, None, None, :]))               # [B,x,i,20]
    r_feat = r_feat.astype(wdt)
    npj = hm[:, NP:, 10 * H:10 * H + 2 * Wt]                # [B,NL,2Wt]
    rproj = r_feat @ w["r_mega"]                            # [B,x,i,2Wt]
    a_kj = (hbm[..., 2 * H:2 * H + Wt] + rproj[..., :Wt] + w["t_b"]
            + npj[:, :, None, :Wt] + npj[:, None, :, Wt:])  # [B,k,j,Wt]
    a_ji = rproj[..., Wt:]                                  # [B,j,i,Wt]
    q_pre = (hbm[..., 2 * H + Wt:]
             + hm[:, None, NP:, 10 * H + 2 * Wt:]
             + w["tq_b0"])                                  # [B,j,i,H]
    q_z = jax.nn.relu(_ln(q_pre, w["tq_ln_s"], w["tq_ln_b"]))

    selr3 = t["trip_sel_row"].reshape(B, NL, K8, NL)        # [B,j,k,m]
    selr3_w = t.get("trip_sel_row_w", t["trip_sel_row"]
                    ).reshape(B, NL, K8, NL)
    a_kj_sel = jnp.einsum("bjkm,bmjw->bjkw", selr3_w, a_kj)
    pos_k = jnp.einsum("bjkm,bmc->bjkc", selr3, pos_l)      # [B,j,k,3]
    # flat (b,j,i)-major geometry (k is the second-minor axis everywhere
    # below, so the attention contractions are layout-clean batched dots)
    rel_ki = pos_k[:, :, None, :, :] - pos_l[:, None, :, None, :]
    dot = jnp.sum(rel_l[:, :, :, None, :] * rel_ki, -1)     # [B,j,i,k]
    njsq = jnp.sum(rel_l * rel_l, -1)                       # [B,j,i]
    nksq = jnp.sum(rel_ki * rel_ki, -1)
    cross = jnp.sqrt(jnp.clip(njsq[..., None] * nksq - dot * dot,
                              CROSS_SQ_EPS, None))
    angle = jnp.arctan2(cross, dot)                         # [B,j,i,k]
    if "stageB_enc" in _ABLATE_BATCHED:
        enc_term = jnp.zeros(angle.shape + (Wt,), wdt)
    else:
        # one sin + one cos over the stacked frequency bands (the per-band
        # formulation cost ~0.65 ms/iter in sine/cosine DUS fusions)
        ab = angle[..., None] * jnp.asarray(bands, angle.dtype)
        enc = jnp.concatenate(
            [angle[..., None], jnp.sin(ab), jnp.cos(ab)], -1).astype(wdt)
        enc_term = enc @ w["t_Wang"]
    pre_t = (a_kj_sel[:, :, None, :, :] + a_ji[:, :, :, None, :]
             + enc_term)                                    # [B,j,i,k,Wt]
    pre_t = jax.nn.relu(_ln(pre_t, w["t_ln_s"], w["t_ln_b"]))

    if "stageB_att" in _ABLATE_BATCHED:
        return jnp.einsum("bjikw,wh->bjih", pre_t / K8,
                          w["t_out_Wf"][:Wt]) + w["t_out_b"]
    inv_sw = 1.0 / float(np.sqrt(Wt))
    # ONE 2-D dot for all heads' queries ([B*j*i, H] @ [H, Wt*heads]);
    # scores/pool are (b,j,i)-batched [k,w]x[w,a] / [k,a]x[k,w] contractions
    q_f = ((q_z @ w["tq_W1f"]).reshape(B, NL, NL, Wt, heads)
           + w["tq_b1f"])                                   # [B,j,i,w,a]
    sc_t = jnp.einsum("bjikw,bjiwa->bjika", pre_t, q_f) * inv_sw
    maskf = t["trip_valid"].transpose(0, 2, 3, 1)[..., None]  # [B,j,i,k,1]
    al_t = _softmax_masked(sc_t, maskf, 3)
    pooled = jnp.einsum("bjika,bjikw->bjiaw", al_t, pre_t).astype(wdt)
    # ONE 2-D dot folding the heads back to H ([B*j*i, a*Wt] @ [a*Wt, H])
    t_out = (pooled.reshape(B, NL, NL, heads * Wt) @ w["t_out_Wf"]
             + w["t_out_b"])
    return t_out


def _stage_c(w, new_h, x, hb_new, noh_w, e_pre4, e_w, rel, t,
             d: StackDims):
    """Position update (uses new_h, new hb). Returns x_new [B,N,3].

    ONE mega-dot for every consumer of new_h; v heads are zero-padded
    to H columns inside x_k2/p_k2m so each kv pair is one batched dot."""
    B = new_h.shape[0]
    N, NL, NP, K = d.N, d.NL, d.NP, d.K
    H, heads = d.H, d.heads
    dh = H // heads
    inv_sd = 1.0 / float(np.sqrt(dh))
    nbr_mask = t["nbr_mask"]
    pos_l = x[:, NP:]
    nhm = new_h @ w["nh_mega"]                  # [B,N,10H]
    nproj_x = nhm[..., :4 * H]
    j_x = noh_w @ nproj_x[..., 2 * H:]
    pre_x = ((e_pre4[..., 2 * H:] + j_x).reshape(B, N, K, 2 * H)
             + nproj_x[:, :, None, :2 * H])
    kv_x = _kv_stacked(pre_x, w["e_ln_s"][2:4], w["e_ln_b"][2:4],
                       w["x_k2"], w["x_b2"])                # [B,N,K,2,H]
    xk = kv_x[..., 0, :]
    xv = kv_x[..., 1, :heads] * e_w.reshape(B, N, K, 1)
    q23_pre = nhm[..., 4 * H:6 * H].reshape(B, N, 2, H) + w["q_b0"][2:4]
    q23 = _q_stacked(q23_pre, w["q_ln_s"][2:4], w["q_ln_b"][2:4],
                     w["q_W1"][2:4], w["q_b1"][2:4])        # [B,N,2,H]
    xq = q23[:, :, 0]
    sc_x = jnp.sum(xk.reshape(B, N, K, heads, dh)
                   * xq.reshape(B, N, 1, heads, dh), -1) * inv_sd
    al_x = _softmax_masked(sc_x, nbr_mask, 2)               # [B,N,K,heads]
    w_e = jnp.sum(al_x * xv, -1, keepdims=True) / heads     # [B,N,K,1]
    dx_edge = jnp.sum(w_e * rel, 2)                         # [B,N,3]

    pp = hb_new @ w["p_W"] + w["p_b"]
    nproj_p = nhm[:, NP:, 6 * H:]                           # [B,NL,4H]
    pre_p = (pp + nproj_p[:, None, :, :2 * H]
             + nproj_p[:, :, None, 2 * H:])
    kv_p = _kv_stacked(pre_p, w["p_ln_s"], w["p_ln_b"],
                       w["p_k2m"], w["p_b2m"])              # [B,s,d,2,H]
    pk, pv = kv_p[..., 0, :], kv_p[..., 1, :heads]
    pq = q23[:, NP:, 1]
    sc_p = jnp.sum(pk.reshape(B, NL, NL, heads, dh)
                   * pq.reshape(B, 1, NL, heads, dh), -1) * inv_sd
    al_p = _softmax_masked(sc_p, t["pair_mask"], 1)         # [B,s,d,heads]
    rel_bond = pos_l[:, None, :, :] - pos_l[:, :, None, :]  # [B,s,d]=d-s
    w_p = jnp.sum(al_p * pv, -1, keepdims=True) / heads     # [B,s,d,1]
    dx_bond_l = jnp.sum(w_p * rel_bond, 1)                  # [B,d,3]

    dx = dx_edge + jnp.concatenate(
        [jnp.zeros((B, NP, 3), x.dtype), dx_bond_l], 1)
    lig_mask = jnp.concatenate(
        [jnp.zeros((B, NP, 1), x.dtype), t["mask_l"]], 1)   # [B,N,1]
    return x + dx * lig_mask


def layer_stack_xla2(packed: Dict[str, jnp.ndarray], h, x, hb,
                     tables: Dict[str, jnp.ndarray], dims: StackDims,
                     dtype=None, remat: bool = False):
    """Batched-einsum XLA fused stack: lax.scan over layers, no vmap.

    Same signature/semantics as layer_stack_xla; fully differentiable.
    With dtype=bfloat16 the h/hb carries, packed weights, and feature
    matmuls run in bf16 (positions and softmaxes stay f32); exact bf16
    copies of the 0/1 selection tables serve the h-path matmuls so the
    geometry gathers keep their f32 operands. remat=True rematerializes
    each layer in the backward pass (training: the per-layer edge/triplet
    grids otherwise all live until the backward sweep)."""
    if dtype is not None and dtype != jnp.float32:
        # rbf_off is a geometric constant (Gaussian-smearing centers): the
        # distance subtraction re-promotes to f32, so casting it would only
        # quantize the center values (~0.4%) for zero speed — keep it f32.
        packed = {k: (v if k == "rbf_off" else v.astype(dtype))
                  for k, v in packed.items()}
        h, hb = h.astype(dtype), hb.astype(dtype)
        tables = dict(tables)
        tables["nbr_onehot_w"] = tables["nbr_onehot"].astype(dtype)
        tables["trip_sel_row_w"] = tables["trip_sel_row"].astype(dtype)

    math_fn = _layer_math_batched
    if remat:
        math_fn = jax.checkpoint(_layer_math_batched,
                                 static_argnums=(5,), prevent_cse=False)

    def body(carry, wl):
        return math_fn(wl, *carry, tables, dims), None

    (h_o, x_o, hb_o), _ = jax.lax.scan(body, (h, x, hb), packed)
    return h_o, x_o, hb_o


# --------------------------------------------------------------------------
# Pallas kernels: one call per (stage, layer), grid (B,)
#
# The monolithic (B, L)-grid whole-stack kernel lowers cleanly but the
# remote TPU compiler backend crashes on it even after ~30 min; three
# smaller stage kernels (node update / triplet / pos update) compile in
# minutes, are each compiled ONCE (layers share shapes; only weight values
# differ), and still collapse the per-iteration thunk count ~100x. The
# stage intermediates (new_h, hb_new) pass through HBM — a few hundred KB
# per layer; the [N*K, 4H] edge pre-features are NOT an intermediate: each
# stage recomputes its own weight-column half (exact, and the difference
# between fitting and OOMing the 16 MB scoped VMEM at B=16).
# --------------------------------------------------------------------------

_FORCE_INTERPRET = False

# The Mosaic stack allocator's conservative liveness model books 17-27 MB
# for stage bodies whose true per-step footprint is a few MB (every
# unrolled-slice intermediate gets its own slot); the 16 MB scoped default
# is a compiler heuristic, not the physical budget. Raise the cap and let
# the real allocator place buffers.
_VMEM_LIMIT = 96 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)

_NODE_W = ("rbf_off", "dire_W", "dire_b", "e_W", "e_b", "e_Wn_h", "e_ln_s",
           "e_ln_b", "e_k2", "e_b2", "head_mask", "q_W0", "q_b0", "q_ln_s",
           "q_ln_b", "q_W1", "q_b1", "b_W", "b_b", "b_Wn", "b_ln_s",
           "b_ln_b", "b_k2", "b_b2", "lin_W", "lin_b")
_NODE_T = ("nbr_onehot", "nbr_mask", "lig3_w", "pair_mask", "edge_type",
           "e_w", "phore_norm")
_TRIP_PRE_W = ("rbf_off", "t_Whb", "t_Wr", "t_Wn", "t_b", "t_Wji", "t_Wang",
               "t_ln_s", "t_ln_b", "tq_Whb", "tq_Wi", "tq_b0", "tq_ln_s",
               "tq_ln_b")
_TRIP_PRE_T = ("trip_sel_row",)
# merged Stage A+B1 (fused_stack 'pallas3'): one dispatch computes the node
# updates AND the head-independent triplet features — 3 instead of 4
# pallas_calls per layer (round-4 perf plan item 2, BASELINE.md). Kernel
# bodies are unchanged; only the scoped-VMEM liveness of the combined body
# is new, hence the separate config value until measured on real Mosaic.
_NODE_PRE_W = tuple(dict.fromkeys(_NODE_W + _TRIP_PRE_W))
_NODE_PRE_T = tuple(dict.fromkeys(_NODE_T + _TRIP_PRE_T))
# ATT stage: dedicated (B, heads)-grid kernel, see _att_pallas
_POS_W = ("rbf_off", "dire_W", "dire_b", "e_W", "e_b", "e_Wn_nh", "e_ln_s",
          "e_ln_b", "e_xk2", "e_xk2b", "e_xv2", "e_xv2b", "head_mask",
          "q_W0", "q_b0", "q_ln_s", "q_ln_b", "q_W1", "q_b1", "p_W", "p_b",
          "p_Wn", "p_ln_s", "p_ln_b", "p_xk2", "p_xk2b", "p_xv2", "p_xv2b")
_POS_T = ("nbr_onehot", "nbr_mask", "lig3_w", "pair_mask", "edge_type",
          "e_w", "phore_norm", "mask_l")


def _stage_pallas(stage_fn, w_keys, t_keys, n_arr, out_shapes, dims,
                  interpret, ref_w_keys=(), ref_arr_idx=(),
                  out_dtypes=None):
    """Build a pallas_call for one stage: weights replicated (block = full
    array), batch arrays/tables blocked per graph, grid (B,).

    Weights named in `ref_w_keys` are handed to the stage math as VMEM
    *refs* (not loaded values): per-head stacks indexed with a fori_loop
    counter must be refs — `value[i]` with a traced `i` lowers to a gather,
    which Mosaic rejects, while `ref[i]` is a supported dynamic load.
    Array positions in `ref_arr_idx` likewise stay refs (with their leading
    unit block dim) so large inputs can be sliced on demand instead of
    materialized onto the VMEM stack."""

    def call(w_l, tables, *arrays):
        B = arrays[0].shape[0]
        wk = sorted(w_keys)
        tk = sorted(t_keys)
        wl = [w_l[k] for k in wk]
        tl = [tables[k] for k in tk]
        n_w, n_t = len(wl), len(tl)

        def kernel(*refs):
            w = {k: (r if k in ref_w_keys else r[...])
                 for k, r in zip(wk, refs[:n_w])}
            t = {k: r[0] for k, r in zip(tk, refs[n_w:n_w + n_t])}
            arrs = [r if i in ref_arr_idx else r[0]
                    for i, r in enumerate(refs[n_w + n_t:n_w + n_t + n_arr])]
            outs = refs[n_w + n_t + n_arr:]
            res = stage_fn(w, t, *arrs)
            if not isinstance(res, tuple):
                res = (res,)
            for o_ref, val in zip(outs, res):
                if isinstance(val, list):
                    # slice-wise writes (no stacked temp on the VMEM stack)
                    for k, sl in enumerate(val):
                        o_ref[0, k] = sl.astype(o_ref.dtype)
                else:
                    o_ref[0] = val.astype(o_ref.dtype)

        def w_spec(le):
            return pl.BlockSpec(le.shape,
                                lambda b, nd=le.ndim: (0,) * nd)

        def b_spec(le):
            return pl.BlockSpec((1,) + le.shape[1:],
                                lambda b, nd=le.ndim: (b,) + (0,) * (nd - 1))

        odt = out_dtypes or [jnp.float32] * len(out_shapes)
        out = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=([w_spec(le) for le in wl] + [b_spec(le) for le in tl]
                      + [b_spec(a) for a in arrays]),
            out_specs=[b_spec_o for b_spec_o in
                       (pl.BlockSpec((1,) + s, lambda b, nd=len(s): (b,)
                                     + (0,) * nd) for s in out_shapes)],
            out_shape=[jax.ShapeDtypeStruct((B,) + s, dt)
                       for s, dt in zip(out_shapes, odt)],
            interpret=interpret or _FORCE_INTERPRET,
            compiler_params=_COMPILER_PARAMS,
        )(*(wl + tl + list(arrays)))
        return out if len(out_shapes) > 1 else out[0]

    return call


def _rep_spec(shape):
    """BlockSpec replicating one graph's block across the (b, h) grid."""
    nd = len(shape)
    return pl.BlockSpec((1,) + shape[1:],
                        lambda b, h, nd=nd: (b,) + (0,) * (nd - 1))


def _head_att_accumulate(hh, tqW1, tqb1, toutW, toutb, hb, pt, qz, tv,
                         out_ref, dims: StackDims):
    """One head's triplet-attention contribution, accumulated in place into
    `out_ref` across the minor head grid axis (init at hh == 0). Shared by
    `_att_pallas` and `_att_pos_pallas` — the math must stay identical or
    the pallas3 and pallas2 rungs silently diverge."""
    NL, H, Wt, K8 = dims.NL, dims.H, dims.Wt, dims.K8
    inv_sw = 1.0 / float(np.sqrt(Wt))
    # inter-stage blocks may arrive bf16 (fused_block_dtype); all math
    # here stays f32
    ptk = lambda k: pt[0, k].astype(jnp.float32)
    # tq_b1 [heads, Wt] can't be blocked per head (sublane block of 1
    # violates the (8,128) tiling rule); load the row from the full ref
    q_h = (qz[0].astype(jnp.float32) @ tqW1[0] + tqb1[hh]
           ).reshape(NL, NL, Wt)
    sc = jnp.stack([jnp.sum(ptk(k) * q_h, -1) for k in range(K8)],
                   0) * inv_sw                          # [K8,j,i]
    al = _softmax0_unrolled(sc, tv[0])
    pooled = al[0][..., None] * ptk(0)
    for k in range(1, K8):
        pooled = pooled + al[k][..., None] * ptk(k)     # [NL,NL,Wt]
    contrib = (pooled.reshape(NL * NL, Wt) @ toutW[0]
               ).reshape(NL, NL, H)

    @pl.when(hh == 0)
    def _init():
        out_ref[0] = hb[0] + toutb[...] + contrib

    @pl.when(hh != 0)
    def _acc():
        out_ref[0] = out_ref[0] + contrib


def _att_pallas(dims: StackDims, interpret):
    """Dedicated pallas_call for the triplet head attention: grid
    (B, heads), ONE head per grid step, per-head weight slabs streamed by
    BlockSpec index maps, hb/pre_t/q_z/trip_valid blocks revisited across
    the minor head axis, and the output block accumulated in place
    (init at h==0). Value-level restructurings of the fori_loop variant
    kept 19-24 MB on the Mosaic scoped-VMEM stack; with the head axis in
    the grid each step holds ~1 MB of temporaries."""
    NL, H, heads, Wt = dims.NL, dims.H, dims.heads, dims.Wt

    def kernel(tqW1, tqb1, toutW, toutb, hb, pt, qz, tv, out):
        _head_att_accumulate(pl.program_id(1), tqW1, tqb1, toutW, toutb,
                             hb, pt, qz, tv, out, dims)

    def call(w_l, tables, hb, pre_t, q_z):
        B = hb.shape[0]
        rep = _rep_spec

        return pl.pallas_call(
            kernel,
            grid=(B, heads),
            in_specs=[
                pl.BlockSpec((1, H, Wt), lambda b, h: (h, 0, 0)),   # tq_W1
                pl.BlockSpec((heads, Wt), lambda b, h: (0, 0)),     # tq_b1
                pl.BlockSpec((1, Wt, H), lambda b, h: (h, 0, 0)),   # t_out_W
                pl.BlockSpec((H,), lambda b, h: (0,)),              # t_out_b
                rep(hb.shape), rep(pre_t.shape), rep(q_z.shape),
                rep(tables["trip_valid"].shape),
            ],
            out_specs=pl.BlockSpec((1, NL, NL, H),
                                   lambda b, h: (b, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, NL, NL, H), jnp.float32),
            interpret=interpret or _FORCE_INTERPRET,
            compiler_params=_COMPILER_PARAMS,
        )(w_l["tq_W1"], w_l["tq_b1"], w_l["t_out_W"], w_l["t_out_b"],
          hb, pre_t, q_z, tables["trip_valid"])

    return call


def _att_pos_pallas(dims: StackDims, interpret):
    """Triplet head attention with the POS update fused into the last
    head's epilogue (fused_stack 'pallas2'): grid (B, heads); the hb_new
    output block accumulates in place across the head axis, and at
    h == heads-1 the completed hb_new feeds `_stage_pos` inside the same
    grid step — 2 dispatches/layer with `merge_node_pre`. The pos-stage
    temporaries are only live in the final head step; the scoped-VMEM
    booking stays under the 96 MB cap because the ATT per-step footprint
    is ~1 MB."""
    NL, N, H, heads = dims.NL, dims.N, dims.H, dims.heads
    Wt = dims.Wt
    pw = sorted(_POS_W)
    pt_keys = sorted(_POS_T)
    n_pw, n_pt = len(pw), len(pt_keys)

    def kernel(*refs):
        tqW1, tqb1, toutW, toutb = refs[:4]
        pos_w_refs = refs[4:4 + n_pw]
        pos_t_refs = refs[4 + n_pw:4 + n_pw + n_pt]
        hb, pt, qz, tv, new_h, x = refs[4 + n_pw + n_pt:
                                        4 + n_pw + n_pt + 6]
        out_hb, out_x = refs[-2:]

        hh = pl.program_id(1)
        _head_att_accumulate(hh, tqW1, tqb1, toutW, toutb,
                             hb, pt, qz, tv, out_hb, dims)

        @pl.when(hh == heads - 1)
        def _pos_epilogue():
            w = {k: r[...] for k, r in zip(pw, pos_w_refs)}
            t = {k: r[0] for k, r in zip(pt_keys, pos_t_refs)}
            out_x[0] = _stage_pos(w, new_h[0], x[0], out_hb[0], t, dims)

    def call(w_l, tables, hb, pre_t, q_z, new_h, x):
        B = hb.shape[0]
        rep = _rep_spec

        def w_rep(le):       # full weight array for every (b, h)
            return pl.BlockSpec(le.shape, lambda b, h, nd=le.ndim: (0,) * nd)

        pos_w = [w_l[k] for k in pw]
        pos_t = [tables[k] for k in pt_keys]
        outs = pl.pallas_call(
            kernel,
            grid=(B, heads),
            in_specs=(
                [pl.BlockSpec((1, H, Wt), lambda b, h: (h, 0, 0)),   # tq_W1
                 pl.BlockSpec((heads, Wt), lambda b, h: (0, 0)),     # tq_b1
                 pl.BlockSpec((1, Wt, H), lambda b, h: (h, 0, 0)),   # t_out_W
                 pl.BlockSpec((H,), lambda b, h: (0,))]              # t_out_b
                + [w_rep(a) for a in pos_w]
                + [rep(a.shape) for a in pos_t]
                + [rep(hb.shape), rep(pre_t.shape), rep(q_z.shape),
                   rep(tables["trip_valid"].shape),
                   rep(new_h.shape), rep(x.shape)]),
            out_specs=[pl.BlockSpec((1, NL, NL, H),
                                    lambda b, h: (b, 0, 0, 0)),
                       pl.BlockSpec((1, N, 3), lambda b, h: (b, 0, 0))],
            out_shape=[jax.ShapeDtypeStruct((B, NL, NL, H), jnp.float32),
                       jax.ShapeDtypeStruct((B, N, 3), jnp.float32)],
            interpret=interpret or _FORCE_INTERPRET,
            compiler_params=_COMPILER_PARAMS,
        )(w_l["tq_W1"], w_l["tq_b1"], w_l["t_out_W"], w_l["t_out_b"],
          *pos_w, *pos_t, hb, pre_t, q_z, tables["trip_valid"], new_h, x)
        return outs[0], outs[1]

    return call


def layer_stack_pallas(packed: Dict[str, jnp.ndarray], h, x, hb,
                       tables: Dict[str, jnp.ndarray], dims: StackDims,
                       interpret: bool = False,
                       merge_node_pre: bool = False,
                       merge_pos: bool = False,
                       block_dtype=jnp.float32):
    """Same contract as `layer_stack_xla`, executed as Pallas stage kernels
    per layer (each stage compiled once; every edge/triplet grid stays in
    VMEM). `merge_node_pre` (fused_stack 'pallas3') combines the node and
    triplet-PRE stages into one dispatch — 3 instead of 4 calls/layer;
    `merge_pos` additionally folds the pos update into the attention
    kernel's last head step (fused_stack 'pallas2' — 2 calls/layer).
    `block_dtype=bfloat16` stores the PRE->ATT inter-stage blocks (pre_t,
    q_z — the dominant HBM round-trip) in bf16; all in-kernel math stays
    f32 (config `denoiser.fused_block_dtype`)."""
    L = packed["lin_b"].shape[0]
    N, NL, K, H = dims.N, dims.NL, dims.K, dims.H
    K8, Wt = dims.K8, dims.Wt
    bdt = block_dtype

    if merge_node_pre:
        node_pre_call = _stage_pallas(
            lambda w, t, h_, x_, hb_: _stage_node_pre(w, h_, x_, hb_, t,
                                                      dims),
            _NODE_PRE_W, _NODE_PRE_T, 3,
            [(N, H), (K8, NL, NL, Wt), (NL * NL, H)], dims, interpret,
            out_dtypes=[jnp.float32, bdt, bdt])
    else:
        node_call = _stage_pallas(
            lambda w, t, h_, x_, hb_: _stage_node(w, h_, x_, hb_, t, dims),
            _NODE_W, _NODE_T, 3, [(N, H)], dims, interpret)
        trip_pre_call = _stage_pallas(
            lambda w, t, h_, x_, hb_: _stage_triplet_pre(w, h_, x_, hb_, t,
                                                         dims),
            _TRIP_PRE_W, _TRIP_PRE_T, 3, [(K8, NL, NL, Wt), (NL * NL, H)],
            dims, interpret, out_dtypes=[bdt, bdt])
    if merge_pos:
        att_pos_call = _att_pos_pallas(dims, interpret)
    else:
        trip_att_call = _att_pallas(dims, interpret)
        pos_call = _stage_pallas(
            lambda w, t, nh_, x_, hbn_: _stage_pos(w, nh_, x_, hbn_, t,
                                                   dims),
            _POS_W, _POS_T, 3, [(N, 3)], dims, interpret)

    for l in range(L):
        w_l = jax.tree_util.tree_map(lambda a: a[l], packed)
        if merge_node_pre:
            new_h, pre_t, q_z = node_pre_call(w_l, tables, h, x, hb)
        else:
            new_h = node_call(w_l, tables, h, x, hb)
            pre_t, q_z = trip_pre_call(w_l, tables, h, x, hb)
        if merge_pos:
            hb, x = att_pos_call(w_l, tables, hb, pre_t, q_z, new_h, x)
        else:
            hb = trip_att_call(w_l, tables, hb, pre_t, q_z)
            x = pos_call(w_l, tables, new_h, x, hb)
        h = new_h
    return h, x, hb


def make_layer_stack_grad(dims: StackDims, interpret: bool = False,
                          merge_node_pre: bool = False,
                          merge_pos: bool = False,
                          block_dtype=jnp.float32):
    """Grad-capable fused stack: Pallas kernels forward, XLA-path backward.

    `pallas_call` has no VJP rule for these kernels, so training through
    `denoiser.fused_stack=pallas*` would fail at trace time. This wrapper
    makes the fused stack usable under `jax.grad`: the primal runs
    `layer_stack_pallas` (fast path), and the cotangent recomputes the
    forward through `layer_stack_xla` — the packing-parity oracle with
    IDENTICAL math by construction (same packed weights, same tables, same
    stage algebra) — and pulls back through its VJP. This is the standard
    rematerialization trade (recompute forward on the backward pass), which
    training already opts into via `remat_layers`; the saving versus the
    flax path is the fused forward plus the f32 residuals that never get
    stored. Cotangents flow to every float input (packed weights, h/x/hb,
    and the differentiable tables — e_w and phore_norm; the one-hot
    selection tables receive zeros, matching the frozen-kNN semantics the
    kernel already imposes via `block_knn_freeze`).

    Scope of the parity claim: exact for `block_dtype=float32` (the config
    the grad parity test pins). With `fused_block_dtype=bfloat16` the
    primal quantizes the PRE->ATT inter-stage blocks while the backward
    recomputes in full f32 — i.e. straight-through-estimator semantics for
    the block quantization (the ~1e-2-relative forward perturbation is
    NOT reflected in the cotangents). That is a deliberate, documented
    approximation, not the identical-math remat.
    """

    def _pallas(packed, h, x, hb, tables):
        return layer_stack_pallas(packed, h, x, hb, tables, dims,
                                  interpret=interpret,
                                  merge_node_pre=merge_node_pre,
                                  merge_pos=merge_pos,
                                  block_dtype=block_dtype)

    def _xla(packed, h, x, hb, tables):
        return layer_stack_xla(packed, h, x, hb, tables, dims)

    @jax.custom_vjp
    def f(packed, h, x, hb, tables):
        return _pallas(packed, h, x, hb, tables)

    def fwd(packed, h, x, hb, tables):
        return _pallas(packed, h, x, hb, tables), (packed, h, x, hb, tables)

    def bwd(res, g):
        _, vjp = jax.vjp(_xla, *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f
