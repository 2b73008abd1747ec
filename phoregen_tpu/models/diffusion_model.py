"""Top-level denoising network: embedders, denoiser, prediction heads.

Parity target: `PhoreDiff.forward` (reference `models/diffusion.py:175-246`)
plus the atom-count interval head (`predict_atom_count`, :148-163):
- node/edge embeddings concatenated with a 10-dim linear-grid time embedding;
- optional phore self-encoder over the fully-connected phore graph with a
  pairwise-distance edge feature (`hp_emb_with_pos`);
- composed-context denoiser;
- v_inference (12-way), bond head ('lin' or 'pre_att', 6-way), and the
  [lower, upper] atom-count interval from masked means over phore nodes.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import ModelConfig
from ..ops.masked import masked_mean
from ..ops.rbf import (gaussian_smearing, gaussian_smearing_offsets,
                       time_smearing, time_smearing_offsets)
from .denoiser import UniDenoiser
from .layers import MLP, NodeUpdateDense, shifted_softplus


class PhoreDiffNet(nn.Module):
    """Pure forward network. Diffusion/loss logic lives in `PhoreGen`."""
    config: ModelConfig
    ex_col: int  # EX one-hot column (12 for 13-type vocab, else 10)

    def _time_embed(self, t: jnp.ndarray) -> jnp.ndarray:
        """t: [B] int -> [B, time_dim] linear Gaussian-grid embedding."""
        cfg = self.config
        offs, coeff = time_smearing_offsets(
            0.0, cfg.diff.num_timesteps, cfg.diff.time_dim, "linear")
        return time_smearing(t, jnp.asarray(offs), jnp.asarray(coeff),
                             0.0, cfg.diff.num_timesteps)

    @nn.compact
    def __call__(self, h_node_pert, pos_pert, lig_mask, h_edge_pert,
                 t, phore_x, phore_pos, phore_norm, phore_mask):
        """
        Args:
          h_node_pert: [B, NL, Ka] perturbed atom one-hots.
          pos_pert: [B, NL, 3] perturbed positions.
          lig_mask: [B, NL] bool.
          h_edge_pert: [B, NL, NL, Kb] perturbed dense bond one-hots.
          t: [B] int32 timestep per graph.
          phore_x/pos/norm/mask: [B, NP, *].
        Returns: (pred_node [B,NL,Ka], pred_pos [B,NL,3],
                  pred_edge [B,NL,NL,Kb] or None,
                  (count_lower, count_upper) each [B, 1])
        """
        cfg = self.config
        B, NL, Ka = h_node_pert.shape
        NP = phore_x.shape[1]
        H = cfg.hidden_dim
        time_dim = cfg.diff.time_dim

        # ---- embeddings ----
        t_emb = self._time_embed(t)                                 # [B, td]
        node_emb = nn.Dense(H - time_dim, use_bias=False,
                            name="node_embedder")(h_node_pert)
        h_node = jnp.concatenate(
            [node_emb, jnp.broadcast_to(t_emb[:, None, :], (B, NL, time_dim))],
            axis=-1)

        h_phore_emb = nn.Dense(H, name="phore_embedding")(phore_x)
        if cfg.hp_emb_with_pos:
            # fully-connected phore graph WITH self loops
            # (reference `fully_connect_two_graphs`, `models/common.py:329-356`)
            d = phore_pos[:, :, None, :] - phore_pos[:, None, :, :]
            dist = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True) + 1e-12)
            pmask = phore_mask[:, :, None] & phore_mask[:, None, :]
            h_phore_emb = NodeUpdateDense(
                hidden_dim=H, n_heads=cfg.denoiser.n_heads,
                norm=cfg.denoiser.norm, act_fn=cfg.denoiser.act_fn,
                out_fc=cfg.denoiser.x2h_out_fc,
                name="phore_encoder")(h_phore_emb, dist, pmask)

        if cfg.bond_diffusion:
            edge_emb = nn.Dense(H - time_dim, use_bias=False,
                                name="edge_embedder")(h_edge_pert)
            h_edge = jnp.concatenate(
                [edge_emb, jnp.broadcast_to(t_emb[:, None, None, :],
                                            (B, NL, NL, time_dim))], axis=-1)
        else:
            d = pos_pert[:, None, :, :] - pos_pert[:, :, None, :]
            dist = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True) + 1e-12)
            dist_emb = nn.Dense(H - time_dim, name="distance_embedding")(dist)
            h_edge = jnp.concatenate(
                [dist_emb, jnp.broadcast_to(t_emb[:, None, None, :],
                                            (B, NL, NL, time_dim))], axis=-1)

        # ---- compose + denoise ----
        h_all = jnp.concatenate([h_phore_emb, h_node], axis=1)     # [B,N,H]
        pos_all = jnp.concatenate([phore_pos, pos_pert], axis=1)
        node_mask = jnp.concatenate([phore_mask, lig_mask], axis=1)

        dcfg = cfg.denoiser
        outputs = UniDenoiser(
            num_blocks=dcfg.num_blocks, num_layers=dcfg.num_layers,
            hidden_dim=H, n_heads=dcfg.n_heads, knn=dcfg.knn,
            edge_feat_dim=dcfg.edge_feat_dim,
            num_r_gaussian=dcfg.num_r_gaussian, act_fn=dcfg.act_fn,
            norm=dcfg.norm, cutoff_mode=dcfg.cutoff_mode, r_max=dcfg.r_max,
            x2h_out_fc=dcfg.x2h_out_fc,
            h_node_in_bond_net=dcfg.h_node_in_bond_net,
            direction_match=dcfg.direction_match,
            use_global_ew=dcfg.use_global_ew, num_phore=NP,
            name="denoiser")(h_all, pos_all, h_edge, node_mask,
                             phore_norm=phore_norm)

        final_pos = outputs["x"][:, NP:]
        final_h = outputs["h"][:, NP:]

        # ---- heads ----
        vh = nn.Dense(H, name="v_inference_0")(final_h)
        pred_node = nn.Dense(cfg.num_atom_classes, name="v_inference_2")(
            shifted_softplus(vh))

        pred_edge = None
        if cfg.bond_diffusion:
            if cfg.bond_net_type == "lin":
                bond_in = outputs["h_bond"]
            elif cfg.bond_net_type == "pre_att":
                offs, coeff = gaussian_smearing_offsets(
                    0.0, 5.0, num_gaussians=dcfg.num_r_gaussian,
                    fix_offset=False)
                d = final_pos[:, None, :, :] - final_pos[:, :, None, :]
                dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
                r_feat = gaussian_smearing(dist, jnp.asarray(offs), coeff)
                hi = final_h[:, None, :, :]  # dst
                hj = final_h[:, :, None, :]  # src
                hij = jnp.broadcast_to((hi + hj) / 2,
                                       (B, NL, NL, H))
                bond_in = jnp.concatenate([r_feat, hij], axis=-1)
            else:
                raise ValueError(cfg.bond_net_type)
            bh = nn.Dense(H, name="bond_inference_0")(bond_in)
            pred_edge = nn.Dense(cfg.num_bond_classes, name="bond_inference_2")(
                shifted_softplus(bh))

        pred_count = self.predict_atom_count(h_phore_emb, phore_x, phore_mask)
        return pred_node, final_pos, pred_edge, pred_count

    @nn.compact
    def predict_atom_count(self, h_p, raw_phore_x, phore_mask):
        """[lower, upper] interval over normalized atom count.

        Parity: reference `models/diffusion.py:148-163`; lower bound uses only
        non-EX phore nodes via the raw feature column, upper = lower +
        relu(mean_all - lower). Means are masked (padded slots excluded —
        implicit in the reference's unpadded layout).
        """
        cfg = self.config
        H = cfg.hidden_dim

        def head(name, x):
            y = nn.Dense(2 * H, name=f"{name}_0")(x)
            y = nn.Dense(1, name=f"{name}_2")(nn.relu(y))
            return nn.sigmoid(y)

        count_all = head("atom_mlp", h_p)                    # [B, NP, 1]
        count_all = masked_mean(count_all, phore_mask[..., None], axis=1)
        mask_nonex = (raw_phore_x[..., self.ex_col] != 1) & phore_mask
        count_l = head("atom_mlp_1", h_p)
        count_l = masked_mean(count_l, mask_nonex[..., None], axis=1)
        count_u = count_l + nn.relu(count_all - count_l)
        return count_l, count_u
