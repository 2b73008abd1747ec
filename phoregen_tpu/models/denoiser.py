"""The graph-attention denoiser over the composed phore+ligand point cloud.

Parity target: `UniTransformerO2TwoUpdateGeneralBond`
(reference `models/uni_denoiser.py:301-430`): per block, rebuild the k-NN
graph over *current* positions, derive 4-way ll/lp/pl/pp edge types and the
sigmoid global edge weight from a distance RBF, then run the shared stack of
attention layers, each doing: node update via knn edges + node update via
ligand bonds -> residual h update; triplet bond update (residual); two
position updates (knn + bond) masked to ligand atoms.

Layout: composed node axis = [phore(NP); ligand(NL)] fixed blocks — the
reference's stable-sort `compose_context` (`models/common.py:180-208`) is a
no-op here because every padded graph has identical block structure.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.knn import knn_neighbors
from ..ops.masked import masked_mean
from ..ops.rbf import gaussian_smearing, gaussian_smearing_offsets
from .layers import (MLP, BondUpdateTriplet, NodeUpdateDense, NodeUpdateKNN,
                     PosUpdateDense, PosUpdateKNN, gather_nodes)


def neighbor_centroid_norm(pos_l: jnp.ndarray, mask_l: jnp.ndarray,
                           k: int = 3, frozen=None) -> jnp.ndarray:
    """Mean of the k nearest ligand neighbours minus own position.

    Parity: `get_neib_norm` (reference `models/common.py:300-304`).
    `frozen`: optional precomputed (idx, mask) neighbour table — the
    `block_knn_freeze` mode evaluates the centroid at *current* positions
    over a neighbour set fixed once per block.
    """
    if frozen is not None:
        nbr_idx, nbr_mask = frozen
    else:
        nbr_idx, nbr_mask = knn_neighbors(pos_l, mask_l, k)
    xj = gather_nodes(pos_l, nbr_idx)                 # [B,NL,k,3]
    centroid = masked_mean(xj, nbr_mask[..., None], axis=2)
    return centroid - pos_l


class UniDenoiser(nn.Module):
    """num_blocks x (graph rebuild -> num_layers shared attention layers)."""
    num_blocks: int = 1
    num_layers: int = 6
    hidden_dim: int = 128
    n_heads: int = 16
    knn: int = 32
    edge_feat_dim: int = 4      # 4-way ll/lp/pl/pp one-hot
    num_r_gaussian: int = 20
    act_fn: str = "relu"
    norm: bool = True
    cutoff_mode: str = "knn"
    r_max: float = 10.0
    x2h_out_fc: bool = False
    h_node_in_bond_net: bool = True
    direction_match: bool = True
    use_global_ew: bool = True
    triplet_mode: str = "factorized"
    triplet_pool_follow_dtype: bool = True
    edge_mlp_apply: str = "split"
    triplet_width: int = 32
    use_pallas_triplet: bool = False
    scan_layers: bool = True
    triplet_knn: int = 0
    remat_layers: bool = True
    # freeze the layer-internal kNN tables (dire 3-NN centroid set, kNN
    # triplet source set) once per block instead of recomputing from the
    # drifting positions at every layer: positions move little within a
    # block, and a fixed neighbour set is what makes the fused Pallas layer
    # stack (ops/layer_stack.py) a single kernel. Values still use current
    # positions; only the index SETS are frozen.
    block_knn_freeze: bool = False
    # fused whole-stack execution (ops/layer_stack.py): 'none' = per-layer
    # flax modules (training path — differentiable, remat-able);
    # 'xla' = packed-weights lax.scan (parity/fallback); 'pallas' = single
    # TPU kernel per block (the sampling hot path). Both fused modes imply
    # block_knn_freeze semantics and require the flagship configuration
    # (norm, direction_match, include_h_node, factorized kNN triplet,
    # scan_layers for stacked params).
    fused_stack: str = "none"
    # dtype of the fused stack's PRE->ATT inter-stage HBM blocks
    # (ops/layer_stack.py block_dtype); in-kernel math stays f32
    fused_block_dtype: str = "float32"

    @nn.compact
    def __call__(self, h, x, h_bond, node_mask, phore_norm=None,
                 num_phore: int = 0, fused_packed=None):
        """
        Args:
          h: [B, N, H] composed features ([phore; ligand]).
          x: [B, N, 3] composed positions.
          h_bond: [B, NL, NL, H] dense ligand bond hidden state (src, dst).
          node_mask: [B, N] composed validity.
          phore_norm: [B, NP, 3] unit feature-direction vectors.
          fused_packed: optional precomputed `pack_fused()` output. Packing
            is pure weight algebra (merged-operand concats/folds) and is
            LOOP-INVARIANT through a reverse process, but XLA does not hoist
            its concatenates out of a lax.scan — the sampler computes it
            once outside the scan and passes it here (measured ~3 ms/iter
            on the round-4 chip otherwise).
        Returns dict(x, h, h_bond).
        """
        B, N, H = h.shape
        NP = num_phore
        NL = N - NP
        if self.direction_match and phore_norm is None:
            # fail loudly in BOTH layer-stack paths: the scan path used to
            # substitute zero norms silently (a different model), while the
            # unscanned path crashed with an opaque concatenate TypeError
            raise ValueError(
                "direction_match=True requires phore_norm (got None)")
        offsets, coeff = gaussian_smearing_offsets(fix_offset=True)
        offsets = jnp.asarray(offsets)

        is_lig = jnp.concatenate([jnp.zeros(NP), jnp.ones(NL)]).astype(bool)
        mask_l = node_mask[:, NP:]
        # dense ligand pair mask (directed, no self loops)
        eye = jnp.eye(NL, dtype=bool)
        pair_mask = mask_l[:, :, None] & mask_l[:, None, :] & ~eye

        # shared layer stack, reused across blocks (reference shares
        # `base_block` across blocks, `uni_denoiser.py:339-349,419-421`)
        layer_kw = dict(hidden_dim=self.hidden_dim, n_heads=self.n_heads,
                        num_r_gaussian=self.num_r_gaussian,
                        edge_feat_dim=self.edge_feat_dim,
                        act_fn=self.act_fn, norm=self.norm,
                        x2h_out_fc=self.x2h_out_fc,
                        include_h_node=self.h_node_in_bond_net,
                        direction_match=self.direction_match,
                        triplet_mode=self.triplet_mode,
                        triplet_width=self.triplet_width,
                        use_pallas_triplet=self.use_pallas_triplet,
                        triplet_knn=self.triplet_knn,
                        triplet_pool_follow_dtype=self.triplet_pool_follow_dtype,
                        edge_mlp_apply=self.edge_mlp_apply)
        body_kw = dict(layer_kw, block_knn_freeze=self.block_knn_freeze)
        if self.scan_layers:
            # one nn.scan'd layer with stacked params: the compiled body is
            # ~num_layers x smaller (same math, same per-layer params);
            # remat drops per-layer activations in the backward pass
            body = (nn.remat(_ScanLayerBody, prevent_cse=False)
                    if self.remat_layers else _ScanLayerBody)
            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.num_layers,
                in_axes=(nn.broadcast,) * 12,
            )(name="layers", **body_kw)
        else:
            layers = [
                _AttentionLayer(**layer_kw, name=f"layer_{i}")
                for i in range(self.num_layers)
            ]
        if self.use_global_ew:
            edge_pred = MLP(1, self.hidden_dim, norm=self.norm,
                            name="edge_pred_layer")
        for _ in range(self.num_blocks):
            # reference `_connect_edge` (`uni_denoiser.py:351-361`): knn,
            # radius, or hybrid graph over current positions. Radius maps to
            # the k-capped static-shape form (radius semantics at typical
            # densities); hybrid (ligand-knn + full phore affiliation) is
            # rejected loudly — no shipped config selects it.
            if self.cutoff_mode == "knn":
                nbr_idx, nbr_mask = knn_neighbors(x, node_mask, self.knn)
            elif self.cutoff_mode == "radius":
                from ..ops.knn import radius_neighbors
                nbr_idx, nbr_mask = radius_neighbors(x, node_mask, self.knn,
                                                     self.r_max)
            elif self.cutoff_mode == "hybrid":
                # ligand: fully-connected + k nearest phore; phore: knn over
                # all (reference `uni_denoiser.py:356-358`)
                from ..ops.knn import hybrid_neighbors
                nbr_idx, nbr_mask = hybrid_neighbors(x, node_mask, NP,
                                                     self.knn)
            else:
                raise NotImplementedError(
                    f"cutoff_mode {self.cutoff_mode!r} (supported: knn, "
                    "radius, hybrid)")
            # 4-way edge type: (src_lig,dst_lig)->0, (1,0)->1, (0,1)->2, (0,0)->3
            src_lig = jnp.take(is_lig, nbr_idx)          # [B,N,K]
            dst_lig = jnp.broadcast_to(is_lig[None, :, None], src_lig.shape)
            etype = 3 - 2 * src_lig.astype(jnp.int32) - dst_lig.astype(jnp.int32)
            edge_type = jax.nn.one_hot(etype, 4, dtype=h.dtype)

            lig3 = trip = None
            if self.block_knn_freeze:
                pos_l0 = x[:, NP:]
                lig3 = knn_neighbors(pos_l0, mask_l, 3)
                if 0 < self.triplet_knn < NL - 1:
                    trip = knn_neighbors(pos_l0, mask_l, self.triplet_knn)

            e_w = None
            if self.use_global_ew:
                xj = gather_nodes(x, nbr_idx)
                diff = x[:, :, None, :] - xj
                d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
                # position-derived features drop to the compute dtype at the
                # feature boundary (geometry itself stays f32)
                dist_feat = gaussian_smearing(d, offsets, coeff
                                              ).astype(h.dtype)
                e_w = jax.nn.sigmoid(edge_pred(dist_feat)[..., 0])  # [B,N,K]

            if self.fused_stack != "none" and not self.is_initializing():
                h, x, h_bond = self._apply_fused_stack(
                    h, x, h_bond, node_mask, mask_l, nbr_idx, nbr_mask,
                    edge_type, e_w, phore_norm, NP, packed=fused_packed)
                continue

            if self.scan_layers:
                # ones = no reweighting (the None case of the unscanned path)
                ew_b = (e_w if e_w is not None
                        else jnp.ones(nbr_idx.shape, h.dtype))
                dummy_i = jnp.zeros((B, NL, 1), jnp.int32)
                dummy_m = jnp.zeros((B, NL, 1), bool)
                (h, h_bond, x), _ = scanned(
                    (h, h_bond, x), edge_type, nbr_idx, nbr_mask, mask_l,
                    pair_mask, node_mask, ew_b,
                    phore_norm if phore_norm is not None
                    else jnp.zeros((B, NP, 3), x.dtype),
                    lig3[0] if lig3 else dummy_i,
                    lig3[1] if lig3 else dummy_m,
                    trip[0] if trip else dummy_i,
                    trip[1] if trip else dummy_m)
            else:
                for layer in layers:
                    h, h_bond, x = layer(h, x, edge_type, nbr_idx, nbr_mask,
                                         h_bond, mask_l, pair_mask, node_mask,
                                         e_w=e_w, phore_norm=phore_norm,
                                         num_phore=NP, lig3_frozen=lig3,
                                         trip_frozen=trip)
        return {"x": x, "h": h, "h_bond": h_bond}

    def _check_fused_config(self):
        """The packed-weight layout hard-codes the flagship configuration
        (edge-feature split [4x20 RBF | 4 type | 9 dire], scan'd stack,
        factorized kNN triplets); raise a descriptive error otherwise."""
        required = dict(scan_layers=self.scan_layers, norm=self.norm,
                        direction_match=self.direction_match,
                        include_h_node=self.h_node_in_bond_net,
                        factorized=self.triplet_mode == "factorized",
                        triplet_knn=self.triplet_knn > 0,
                        no_x2h_out_fc=not self.x2h_out_fc,
                        use_global_ew=self.use_global_ew,
                        num_r_gaussian_20=self.num_r_gaussian == 20,
                        edge_feat_dim_4=self.edge_feat_dim == 4)
        missing = [k for k, v in required.items() if not v]
        if missing:
            raise ValueError(
                f"denoiser.fused_stack={self.fused_stack!r} requires the "
                f"flagship configuration; unmet: {missing}")

    def pack_fused(self):
        """Pack (and operand-merge) the stacked layer weights for the fused
        drivers — callable once outside a sampling scan via
        `net.apply(params, method="pack_fused")` so the merged-weight
        concats/einsums execute once per pool instead of once per reverse
        step. Returns None when no fused stack is configured."""
        if self.fused_stack == "none":
            return None
        self._check_fused_config()
        from ..ops import layer_stack as ls
        raw = self.variables["params"]["layers"]["layer"]
        fe = self.num_r_gaussian * self.edge_feat_dim + self.edge_feat_dim + 9
        return ls.pack_layer_params(raw, self.hidden_dim, fe)

    def _apply_fused_stack(self, h, x, h_bond, node_mask, mask_l, nbr_idx,
                           nbr_mask, edge_type, e_w, phore_norm, NP,
                           packed=None):
        """Run the whole layer stack through ops/layer_stack.py (packed
        weights read from this module's own stacked params). Requires the
        flagship configuration; raises otherwise."""
        from ..ops import layer_stack as ls

        self._check_fused_config()
        B, N, H = h.shape
        NL = N - NP
        K = nbr_idx.shape[-1]
        raw = self.variables["params"]["layers"]["layer"]
        # A ligand node has at most NL-1 neighbours; ops/knn.py clamps its
        # top_k the same way, so K8 > NL-1 would only desync the table
        # reshapes (caught at NL=32 with the knn32 flagship). Exact: the
        # dropped slots are always masked.
        k8 = min(self.triplet_knn, NL - 1)
        dims = ls.StackDims(NP=NP, NL=NL, K=K, K8=k8,
                            H=self.hidden_dim, heads=self.n_heads,
                            Wt=self.triplet_width)
        fe = self.num_r_gaussian * self.edge_feat_dim + self.edge_feat_dim + 9
        if packed is None:
            packed = ls.pack_layer_params(raw, self.hidden_dim, fe)
        tables = ls.build_block_tables(x, node_mask, nbr_idx, nbr_mask, NP,
                                       k8)
        tables["edge_type"] = edge_type.astype(jnp.float32
                                               ).reshape(B, N * K, 4)
        tables["e_w"] = (e_w.astype(jnp.float32) if e_w is not None
                         else jnp.ones((B, N, K), jnp.float32)
                         ).reshape(B, N * K, 1)
        tables["phore_norm"] = phore_norm.astype(jnp.float32)
        hf, xf, hbf = (h.astype(jnp.float32), x.astype(jnp.float32),
                       h_bond.astype(jnp.float32))
        bdt = (jnp.bfloat16 if self.fused_block_dtype == "bfloat16"
               else jnp.float32)
        # Pallas variants go through the custom-VJP wrapper so the fused
        # stack also works under jax.grad (training): Pallas forward,
        # XLA-packed-path backward (ops/layer_stack.py
        # make_layer_stack_grad).
        if self.fused_stack == "pallas":
            run = ls.make_layer_stack_grad(dims, block_dtype=bdt)
            h2, x2, hb2 = run(packed, hf, xf, hbf, tables)
        elif self.fused_stack == "pallas3":
            # merged node+triplet-PRE stage: 3 dispatches/layer
            run = ls.make_layer_stack_grad(dims, merge_node_pre=True,
                                           block_dtype=bdt)
            h2, x2, hb2 = run(packed, hf, xf, hbf, tables)
        elif self.fused_stack == "pallas2":
            # + pos folded into the attention epilogue: 2 dispatches/layer
            run = ls.make_layer_stack_grad(dims, merge_node_pre=True,
                                           merge_pos=True, block_dtype=bdt)
            h2, x2, hb2 = run(packed, hf, xf, hbf, tables)
        elif self.fused_stack == "xla":
            h2, x2, hb2 = ls.layer_stack_xla(packed, hf, xf, hbf, tables,
                                             dims)
        elif self.fused_stack == "xla2":
            # batched-einsum driver: fewest executed thunks per iteration
            # (round-4 clean-chip ladder, BASELINE.md); differentiable.
            # fused_block_dtype=bfloat16 here means: run the h/hb carries
            # and feature matmuls in bf16 (positions/softmaxes stay f32).
            h2, x2, hb2 = ls.layer_stack_xla2(
                packed, hf, xf, hbf, tables, dims,
                dtype=bdt if bdt != jnp.float32 else None,
                remat=self.remat_layers)
        else:
            raise ValueError(f"unknown fused_stack {self.fused_stack!r}")
        return (h2.astype(h.dtype), x2.astype(x.dtype),
                hb2.astype(h_bond.dtype))


class _ScanLayerBody(nn.Module):
    """nn.scan-compatible wrapper: carry = (h, h_bond, x), extras broadcast.

    `num_phore` rides in statically via the phore_norm shape; `e_w` arrives
    as a dense array (zeros = disabled upstream; `use_global_ew` decides
    whether the denoiser computed real weights).
    """
    hidden_dim: int
    n_heads: int
    num_r_gaussian: int
    edge_feat_dim: int
    act_fn: str
    norm: bool
    x2h_out_fc: bool
    include_h_node: bool
    direction_match: bool
    triplet_mode: str = "factorized"
    triplet_pool_follow_dtype: bool = True
    edge_mlp_apply: str = "split"
    triplet_width: int = 32
    use_pallas_triplet: bool = False
    triplet_knn: int = 0
    block_knn_freeze: bool = False

    @nn.compact
    def __call__(self, carry, edge_type, nbr_idx, nbr_mask, mask_l,
                 pair_mask, node_mask, e_w, phore_norm,
                 lig3_idx, lig3_mask, trip_idx, trip_mask):
        h, h_bond, x = carry
        NP = phore_norm.shape[1]
        lig3 = (lig3_idx, lig3_mask) if self.block_knn_freeze else None
        trip = ((trip_idx, trip_mask)
                if self.block_knn_freeze and self.triplet_knn > 0 else None)
        h, h_bond, x = _AttentionLayer(
            hidden_dim=self.hidden_dim, n_heads=self.n_heads,
            num_r_gaussian=self.num_r_gaussian,
            edge_feat_dim=self.edge_feat_dim, act_fn=self.act_fn,
            norm=self.norm, x2h_out_fc=self.x2h_out_fc,
            include_h_node=self.include_h_node,
            direction_match=self.direction_match,
            triplet_mode=self.triplet_mode,
            triplet_width=self.triplet_width,
            use_pallas_triplet=self.use_pallas_triplet,
            triplet_knn=self.triplet_knn,
            triplet_pool_follow_dtype=self.triplet_pool_follow_dtype,
            edge_mlp_apply=self.edge_mlp_apply,
            name="layer")(
            h, x, edge_type, nbr_idx, nbr_mask, h_bond, mask_l, pair_mask,
            node_mask, e_w=e_w, phore_norm=phore_norm, num_phore=NP,
            lig3_frozen=lig3, trip_frozen=trip)
        return (h, h_bond, x), None


class _AttentionLayer(nn.Module):
    """One attention layer: two node updates + bond update + two pos updates.

    Parity: `AttentionLayerO2TwoUpdateNodeGeneral`
    (reference `models/uni_denoiser.py:212-298`).
    """
    hidden_dim: int
    n_heads: int
    num_r_gaussian: int
    edge_feat_dim: int
    act_fn: str
    norm: bool
    x2h_out_fc: bool
    include_h_node: bool
    direction_match: bool
    triplet_mode: str = "factorized"
    triplet_pool_follow_dtype: bool = True
    edge_mlp_apply: str = "split"
    triplet_width: int = 32
    use_pallas_triplet: bool = False
    triplet_knn: int = 0

    @nn.compact
    def __call__(self, h, x, edge_type, nbr_idx, nbr_mask, h_bond,
                 mask_l, pair_mask, node_mask, e_w=None, phore_norm=None,
                 num_phore: int = 0, lig3_frozen=None, trip_frozen=None):
        B, N, H = h.shape
        NP = num_phore
        NL = N - NP
        offsets, coeff = gaussian_smearing_offsets(fix_offset=True)
        offsets = jnp.asarray(offsets)

        # knn edge features: outer(edge_type[4], rbf(d)[20]) -> 80, + type 4
        xj = gather_nodes(x, nbr_idx)
        rel_x = x[:, :, None, :] - xj                       # x[dst] - x[src]
        dist = jnp.sqrt(jnp.sum(rel_x * rel_x, axis=-1) + 1e-12)
        dist_feat = gaussian_smearing(dist, offsets, coeff
                                      ).astype(h.dtype)      # [B,N,K,20]
        outer = (edge_type[..., :, None] * dist_feat[..., None, :]
                 ).reshape(*dist_feat.shape[:-1], -1)        # type-major [.,80]
        edge_feat = jnp.concatenate([outer, edge_type], axis=-1)

        if self.direction_match:
            # phore norms vs ligand neighbour-centroid norms
            # (reference `models/common.py:300-326`)
            neib = neighbor_centroid_norm(x[:, NP:], mask_l, k=3,
                                          frozen=lig3_frozen)
            comb_norm = jnp.concatenate([phore_norm, neib], axis=1)  # [B,N,3]
            vec1 = gather_nodes(comb_norm, nbr_idx)          # norm[src]
            vec2 = jnp.broadcast_to(comb_norm[:, :, None, :], vec1.shape)
            vec3 = -rel_x                                    # x[src] - x[dst]
            dire = jnp.stack([
                jnp.sum(vec1 * vec2, -1),
                jnp.sum(vec1 * vec3, -1),
                jnp.sum(vec2 * vec3, -1)], axis=-1)
            dire = nn.Dense(9, name="dire_embedding")(dire.astype(h.dtype))
            edge_feat = jnp.concatenate([edge_feat, dire], axis=-1)

        new_h_with_edge = NodeUpdateKNN(
            hidden_dim=self.hidden_dim, n_heads=self.n_heads, norm=self.norm,
            act_fn=self.act_fn, out_fc=self.x2h_out_fc,
            apply_style=self.edge_mlp_apply,
            name="node_layer_with_edge")(h, edge_feat, nbr_idx, nbr_mask, e_w)

        # ligand-bond message passing on the ligand block
        h_lig = h[:, NP:]
        node_bond = NodeUpdateDense(
            hidden_dim=self.hidden_dim, n_heads=self.n_heads, norm=self.norm,
            act_fn=self.act_fn, out_fc=self.x2h_out_fc,
            apply_style=self.edge_mlp_apply,
            name="node_layer_with_bond")
        if self.x2h_out_fc:
            # reference parity (`uni_denoiser.py:66-69`): with out_fc the
            # output MLP runs over ALL composed nodes, so phore rows (zero
            # bond messages) still receive node_output([0, h_p]) — run the
            # module on the composed graph with the bond grid confined to
            # the ligand block (phore rows see an empty edge set)
            N = h.shape[1]
            hb_full = jnp.zeros((B, N, N) + h_bond.shape[3:], h_bond.dtype)
            hb_full = hb_full.at[:, NP:, NP:].set(h_bond)
            pm_full = jnp.zeros((B, N, N), bool)
            pm_full = pm_full.at[:, NP:, NP:].set(pair_mask)
            new_h_with_bond = node_bond(h, hb_full, pm_full)
        else:
            nhb_l = node_bond(h_lig, h_bond, pair_mask)
            new_h_with_bond = jnp.concatenate(
                [jnp.zeros((B, NP, H), h.dtype), nhb_l], axis=1)

        # the triplet path mixes position-derived f32 features in; cast its
        # delta back so the h_bond carry dtype is stable under bf16 compute
        new_h_bond = h_bond + BondUpdateTriplet(
            hidden_dim=self.hidden_dim, n_heads=self.n_heads, norm=self.norm,
            act_fn=self.act_fn, include_h_node=self.include_h_node,
            mode=self.triplet_mode, width=self.triplet_width,
            use_pallas=self.use_pallas_triplet, knn_k=self.triplet_knn,
            pool_follow_dtype=self.triplet_pool_follow_dtype,
            apply_style=self.edge_mlp_apply,
            name="bond_layer")(h_lig, h_bond, x[:, NP:], mask_l,
                               trip_frozen=trip_frozen
                               ).astype(h_bond.dtype)

        new_h = h + nn.Dense(self.hidden_dim, name="lin_node")(
            new_h_with_edge + new_h_with_bond)

        # position updates (ligand only)
        dx_edge = PosUpdateKNN(
            hidden_dim=self.hidden_dim, n_heads=self.n_heads, norm=self.norm,
            act_fn=self.act_fn, apply_style=self.edge_mlp_apply,
            name="pos_layer_with_edge")(
            new_h, rel_x, edge_feat, nbr_idx, nbr_mask, e_w)
        pos_l = x[:, NP:]
        rel_bond_x = pos_l[:, None, :, :] - pos_l[:, :, None, :]  # x[dst]-x[src]
        dx_bond_l = PosUpdateDense(
            hidden_dim=self.hidden_dim, n_heads=self.n_heads, norm=self.norm,
            act_fn=self.act_fn, apply_style=self.edge_mlp_apply,
            name="pos_layer_with_bond")(
            new_h[:, NP:], rel_bond_x, new_h_bond, pair_mask)
        dx_bond = jnp.concatenate(
            [jnp.zeros((B, NP, 3), x.dtype), dx_bond_l], axis=1)
        delta_x = dx_edge + dx_bond
        lig_atom_mask = jnp.concatenate(
            [jnp.zeros((B, NP), bool), mask_l], axis=1)
        x = x + delta_x * lig_atom_mask[..., None]
        return new_h, new_h_bond, x
