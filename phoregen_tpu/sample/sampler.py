"""Reverse-diffusion sampling as a single compiled `lax.scan`.

Parity target: `PhoreDiff.sample` + `sample_nodes`
(reference `models/diffusion.py:356-525`): atom-count interval prediction,
per-graph atom-count draws, prior init for pos/node/edge, then the T-step
reverse loop with categorical posterior + Gumbel sampling and the optional
gradient "validity guidance" energies (`utils/sample_utils.py:135-165`)
subtracted from the position posterior mean.

TPU-first divergences (documented):
- The whole loop is one `lax.scan` carried on-device; the host only touches
  data at the end.
- Per-graph variable atom counts become per-graph node masks inside the
  padded batch.
- The reference offsets the initial position noise by `-center`
  (`models/diffusion.py:406`) even though the phore is already centered at
  the origin; we default to initializing at the origin (correct frame) and
  expose `offset_init_by_center=True` for exact reference behavior.
- Guidance per-graph Python loops become masked segment means.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MAX_ATOMS, MIN_ATOMS
from ..data.batching import PhoreGraphBatch
from ..models.phoregen import PhoreGen
from ..ops.masked import log_sample_categorical, masked_mean


@dataclasses.dataclass(frozen=True)
class GuidanceOpt:
    """One guidance drift spec (CLI `--pos_guidance_opt` JSON items)."""
    type: str                 # 'atom_prox' | 'center_prox' | 'frag_attract'
    min_d: float = 1.0
    max_d: float = 3.0
    sigma: float = 1.2        # frag_attract: adjacency kernel scale (A)
    weight: float = 1.0       # frag_attract: energy scale


def atom_prox_energy(pos, h_edge, bond_mask, lig_mask, min_d, max_d):
    """Hinge energy on predicted-bond lengths outside [min_d, max_d].

    Parity: `compute_batch_atom_prox_loss` (reference
    `utils/sample_utils.py:135-155`): per-graph mean over predicted bonds,
    then mean over graphs.
    """
    edge_type = jnp.argmax(h_edge, axis=-1)
    is_bond = bond_mask & (edge_type > 0)
    d = pos[:, None, :, :] - pos[:, :, None, :]
    blen = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    hinge = jnp.clip(blen - max_d, 0.0, None) + jnp.clip(min_d - blen, 0.0, None)
    per_graph = masked_mean(hinge, is_bond, axis=(1, 2))
    return jnp.mean(per_graph)


def frag_attract_energy(pos, lig_mask, sigma=1.2, weight=1.0, n_hops=7):
    """Differentiable connectivity energy: penalize probability mass that a
    soft diffusion from the centroid-nearest atom cannot reach.

    The round-3 failure diagnosis (`scripts/diagnose_r3.py`) found the
    dominant rejection mode is 2-fragment disconnection — geometry splits
    into clusters that the bond head then (correctly) refuses to bond. This
    drift pulls fragments together: heavy-tailed soft adjacency
    W = 1/(1 + (d^2/sigma^2)^3), reachability r = row-normalized W^(2^n_hops)
    applied to a seed at the atom nearest the masked centroid, energy = mean
    unreached mass. For a connected cluster r ~ uniform and E ~ 0; separated
    clusters leave the far cluster's r near zero with gradients flowing
    through the inter-cluster distances (rational kernel, so the gradient
    survives far past the activation gap). A framework extension — the
    reference has no connectivity guidance (its disconnected samples simply
    fail acceptance, `sample_all.py:127-135`).

    Operating point (FRAG_AB_r05 post-mortem): the round-4 exp kernel at
    sigma=3 scored 4-6 A cluster separations as "connected" (zero energy AND
    zero gradient exactly where bond perception disconnects at ~2.5 A), so
    the guidance never activated in real trajectories. Measured on
    two-cluster/chain probes (/tmp/frag_char*.py, gap = nearest-atom
    separation): sigma=1.2, p=6, n_hops=7 keeps stretched-but-connected
    chains at E=0 (16 atoms @ 1.8 A bond: 0.0; 30 @ 1.5: 0.01) while firing
    from 3 A gaps (E 0.05 -> 0.31 at 4 A -> 0.5 asymptote) with |grad|
    >= 1e-4 out to 12 A.
    """
    B, N, _ = pos.shape
    maskf = lig_mask.astype(pos.dtype)                      # [B,N]
    d2 = jnp.sum(jnp.square(pos[:, :, None, :] - pos[:, None, :, :]), -1)
    u = d2 / (sigma * sigma)
    W = 1.0 / (1.0 + u * u * u)                             # [B,N,N]
    W = W * maskf[:, None, :] * maskf[:, :, None]
    # row-stochastic over valid atoms (masked rows stay zero)
    W = W / jnp.maximum(jnp.sum(W, -1, keepdims=True), 1e-12)
    # seed: atom nearest the masked centroid
    centroid = masked_mean(pos, lig_mask[..., None], axis=1)  # [B,3]
    dc = jnp.sum(jnp.square(pos - centroid[:, None, :]), -1)
    dc = jnp.where(lig_mask, dc, jnp.inf)
    seed = jax.nn.one_hot(jnp.argmin(dc, axis=1), N, dtype=pos.dtype)
    # r = seed @ W^(2^n_hops) by repeated squaring (N is small: <= 80)
    Wp = W
    for _ in range(n_hops):
        Wp = Wp @ Wp
    r = jnp.einsum("bn,bnm->bm", seed, Wp)                  # [B,N]
    n_valid = jnp.maximum(jnp.sum(maskf, -1), 1.0)
    # per-atom shortfall vs the uniform share, summed -> fraction of the
    # molecule the seed cannot reach (0 when connected, ~|far cluster|/N
    # when split)
    # penalize mass-shortfall below a *quarter* of the uniform share: a
    # connected (even elongated) molecule clears that bar everywhere ->
    # zero drift; a split one leaves the far cluster near zero mass
    thresh = 0.25 / n_valid[:, None]
    unreached = jnp.sum(jax.nn.relu(thresh - r) * maskf, -1) * 4.0
    return weight * jnp.mean(unreached)                     # [0, ~1)


def center_prox_energy(pos, lig_mask, phore_center):
    """||ligand centroid - non-EX phore centroid|| per graph, averaged.

    Parity: `compute_batch_center_prox_loss` (reference
    `utils/sample_utils.py:158-165`)."""
    centroid = masked_mean(pos, lig_mask[..., None], axis=1)  # [B,3]
    return jnp.mean(jnp.linalg.norm(centroid - phore_center, axis=-1))


class Sampler:
    """Compiled reverse-process sampler bound to a PhoreGen model."""

    def __init__(self, pg: PhoreGen,
                 guidance: Optional[Sequence[GuidanceOpt]] = None,
                 keep_traj: bool = False, unroll: int = 1,
                 sample_steps: int = 0):
        self.pg = pg
        self.guidance = tuple(guidance) if guidance else ()
        self.keep_traj = keep_traj
        # Strided (DDIM-style) sampling: run S < T denoiser evaluations over
        # an evenly-strided timestep subset with EXACT multi-step posteriors
        # (see diffusion/{categorical,gaussian}.py strided builders). 0 or
        # >= T means the full reference schedule. A framework extension —
        # the reference always runs all T steps.
        assert sample_steps == 0 or sample_steps >= 2, (
            "sample_steps must be 0 (full schedule) or >= 2 (the schedule "
            "needs the initial timestep and the final t=0 step)")
        self.sample_steps = sample_steps
        self._strided_cache = {}
        self._chunk_fns = {}  # (shapes, S) -> (run_chunk, run_final) jits
        # Scan unroll factor. On real TPU the rolled loop is optimal (the
        # body compute is ~20 us/step and loop overhead is negligible).
        # Measured through this sandbox's tunneled runtime there is a
        # per-iteration staging overhead proportional to body size (~13 ms
        # per body-equivalent), which unrolling cannot amortize — so the
        # default stays 1; the knob exists for profiling experiments.
        self.unroll = unroll

    # ----- atom count interval -----
    def predict_count_interval(self, params, batch: PhoreGraphBatch
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Integer [lower, upper] per graph (reference
        `models/diffusion.py:356-387` denormalization)."""
        lo, up = self.pg.net.apply(
            params, batch.phore_x, batch.phore_pos, batch.phore_norm,
            batch.phore_mask, method="count_interval")
        denorm = lambda c: jnp.round(
            c * (MAX_ATOMS - MIN_ATOMS) + MIN_ATOMS).astype(jnp.int32)
        return denorm(lo[:, 0]), denorm(up[:, 0])

    @staticmethod
    def sample_counts(key, lower: int, upper: int, batch_size: int,
                      mode: str = "uniform", scale: float = 4.0) -> np.ndarray:
        """Draw per-graph atom counts from the predicted interval
        (reference `utils/sample_utils.py:28-37`)."""
        if mode == "uniform":
            return np.asarray(jax.random.randint(
                key, (batch_size,), lower, upper + 1))
        elif mode == "normal":
            mid = (lower + upper) / 2.0
            std = (upper - lower) / scale
            x = mid + std * np.asarray(jax.random.normal(key, (batch_size,)))
            return np.clip(np.round(x), lower, upper).astype(np.int32)
        raise NotImplementedError(mode)

    # ----- strided schedule -----
    def _schedule(self):
        """(timesteps [S], node/edge (trans_T, cum_prev) [S,K,K] with an
        identity pad at the final slot, gaussian (coef_x0, coef_xt, std) [S]).
        Cached host-side per sample_steps value."""
        pg = self.pg
        T = pg.num_timesteps
        S = self.sample_steps if 0 < self.sample_steps < T else T
        if S in self._strided_cache:
            return self._strided_cache[S]
        # _schedule() is reached inside a jit trace (first sample() call per
        # batch shape), but its products are cached across traces — they
        # must be concrete constants, not trace-scoped tracers (a second
        # batch shape would otherwise hit UnexpectedTracerError)
        with jax.ensure_compile_time_eval():
            return self._build_schedule(S, T)

    def _build_schedule(self, S: int, T: int):
        pg = self.pg
        from ..diffusion.categorical import build_strided_tables
        from ..diffusion.gaussian import build_gaussian_strided

        ts = np.unique(np.round(np.linspace(T - 1, 0, S)).astype(np.int64))
        ts = ts[::-1].copy()                       # descending, ends at 0
        diff = pg.config.model.diff
        mcfg = pg.config.model

        def cat_tables(betas, num_classes, init_prob):
            trans_T, cum_prev = build_strided_tables(
                betas, num_classes, init_prob, ts)
            eye = jnp.eye(num_classes, dtype=jnp.float32)[None]
            return (jnp.concatenate([trans_T, eye], 0),
                    jnp.concatenate([cum_prev, eye], 0))

        if pg.categorical_space == "discrete":
            node_tabs = cat_tables(pg.node_betas, mcfg.num_atom_classes,
                                   diff.diff_atom.init_prob)
            edge_tabs = cat_tables(pg.edge_betas, mcfg.num_bond_classes,
                                   diff.diff_bond.init_prob)
        else:  # continuous relaxation: Gaussian coefs per category channel
            node_tabs = build_gaussian_strided(pg.node_betas, ts)
            edge_tabs = build_gaussian_strided(pg.edge_betas, ts)
        gauss = build_gaussian_strided(pg.pos_betas, ts)
        out = (jnp.asarray(ts, jnp.int32), node_tabs, edge_tabs, gauss)
        self._strided_cache[S] = out
        return out

    # ----- the reverse loop -----
    def _reverse_parts(self, params, batch: PhoreGraphBatch):
        """Build (step_core, traj_slice) closures for the reverse process.

        Shared by the single-scan `sample` and the multi-call
        `sample_chunked`; both therefore run the exact same math and PRNG
        stream per step.
        """
        pg = self.pg
        T = pg.num_timesteps
        mcfg = pg.config.model
        B, NL = batch.lig_type.shape
        lmask = batch.lig_mask
        bond_mask = batch.bond_mask

        # compute dtype for the denoiser network; categorical posteriors,
        # positions and everything geometric always stay float32 (the net
        # keeps position math f32 internally too — see models/denoiser.py)
        bf16 = mcfg.compute_dtype == "bfloat16"
        cdt = jnp.bfloat16 if bf16 else jnp.float32
        net_params = params
        if bf16:
            net_params = jax.tree_util.tree_map(
                lambda x: x.astype(cdt)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
        phore_x_c = batch.phore_x.astype(cdt)
        phore_pos_c = batch.phore_pos
        phore_norm_c = batch.phore_norm
        # the phore embedding (incl. the hp_emb_with_pos self-encoder) and
        # the count head are loop-invariant during the reverse process —
        # compute the embedding ONCE here; as a closure constant of the scan
        # body it is hoisted out of all S-1 iterations (bit-identical math)
        h_phore_const = pg.net.apply(
            net_params, phore_x_c, phore_pos_c, batch.phore_mask,
            method="embed_phore")
        # the fused-stack packed/merged weights are equally loop-invariant;
        # pack ONCE here (XLA does not hoist the merged-operand concats out
        # of the scan on its own — measured ~3 ms/iter on the round-4 chip)
        fused_packed_const = pg.net.apply(net_params, method="pack_fused")

        discrete = pg.categorical_space == "discrete"

        # non-EX phore centroid for center_prox (uses raw phore features,
        # reference `models/diffusion.py:493-497`)
        p_mask = (batch.phore_x[..., pg.ex_col] != 1) & batch.phore_mask
        phore_center = masked_mean(batch.phore_pos, p_mask[..., None], axis=1)

        guidance = self.guidance

        def energy_fn(pos, edge_repr):
            # edge_repr: int8 class ids (discrete) or relaxed one-hots
            e = 0.0
            for g in guidance:
                if g.type == "atom_prox" and mcfg.bond_diffusion:
                    h_edge = (jax.nn.one_hot(edge_repr,
                                             mcfg.num_bond_classes)
                              if jnp.issubdtype(edge_repr.dtype, jnp.integer)
                              else edge_repr)
                    e = e + atom_prox_energy(pos, h_edge, bond_mask, lmask,
                                             g.min_d, g.max_d)
                elif g.type == "center_prox":
                    e = e + center_prox_energy(pos, lmask, phore_center)
                elif g.type == "frag_attract":
                    e = e + frag_attract_energy(pos, lmask, g.sigma,
                                                g.weight)
            return e

        # (possibly strided) reverse schedule: per-step timesteps + exact
        # multi-step posterior tables; full-T reproduces the reference
        # 1-step tables exactly
        ts_arr, node_tabs, edge_tabs, (g_cx0, g_cxt, g_std) = \
            self._schedule()
        if discrete:
            node_tT, node_cp = node_tabs
            edge_tT, edge_cp = edge_tabs
            node_tabs_std = edge_tabs_std = None
        else:  # gaussian coefs (coef_x0, coef_xt, std) per category channel
            node_tT, node_cp, node_tabs_std = node_tabs
            edge_tT, edge_cp, edge_tabs_std = edge_tabs
        S = int(ts_arr.shape[0])

        def step_core(carry, i, is_final: bool):
            """One reverse step. `is_final` is STATIC: the t=0 step runs once
            outside the scan, so the in-scan body is branch-free and the
            per-iteration carry/output staging excludes the preds triple
            (round-2 throughput: smaller per-iteration staged set)."""
            key, pos_pert, node_ids, log_node_type, edge_ids, \
                log_edge_type = carry
            step_t = ts_arr[i]
            t = jnp.full((B,), step_t, jnp.int32)
            key, k_node, k_edge, k_pos = jax.random.split(key, 4)

            if discrete:
                h_node_pert = jax.nn.one_hot(node_ids, mcfg.num_atom_classes,
                                             dtype=cdt)
                h_edge_pert = jax.nn.one_hot(edge_ids, mcfg.num_bond_classes,
                                             dtype=cdt)
            else:
                h_node_pert = node_ids.astype(cdt)
                h_edge_pert = edge_ids.astype(cdt)
            pred_node, pred_pos, pred_edge, _ = pg.net.apply(
                net_params, h_node_pert, pos_pert, lmask,
                h_edge_pert, t, phore_x_c, phore_pos_c, phore_norm_c,
                batch.phore_mask, h_phore_emb=h_phore_const,
                compute_count=False, fused_packed=fused_packed_const)
            pred_node = pred_node.astype(jnp.float32)
            pred_pos = pred_pos.astype(jnp.float32)
            if pred_edge is not None:
                pred_edge = pred_edge.astype(jnp.float32)

            if discrete:
                # categorical posteriors + Gumbel sampling (float32)
                log_node_recon = jax.nn.log_softmax(pred_node, axis=-1)
                log_node_type = pg.node_transition.q_v_posterior_mats(
                    log_node_recon, log_node_type, node_tT[i], node_cp[i],
                    is_final)
                node_prev = log_sample_categorical(k_node, log_node_type
                                                   ).astype(jnp.int8)

                edge_prev = edge_ids
                if mcfg.bond_diffusion:
                    log_edge_recon = jax.nn.log_softmax(pred_edge, axis=-1)
                    log_edge_type = pg.edge_transition.q_v_posterior_mats(
                        log_edge_recon, log_edge_type, edge_tT[i], edge_cp[i],
                        is_final)
                    edge_prev = log_sample_categorical(k_edge, log_edge_type
                                                       ).astype(jnp.int8)
            else:
                # continuous relaxation: Gaussian reverse step on the relaxed
                # one-hots (reference models/diffusion.py:463-469)
                node_prev = pg.node_transition.get_prev_with(
                    k_node, node_ids.astype(jnp.float32), pred_node,
                    node_tT[i], node_cp[i], node_tabs_std[i], is_final)
                edge_prev = edge_ids
                if mcfg.bond_diffusion:
                    edge_prev = pg.edge_transition.get_prev_with(
                        k_edge, edge_ids.astype(jnp.float32), pred_edge,
                        edge_tT[i], edge_cp[i], edge_tabs_std[i], is_final)

            # validity guidance: d(energy)/d(x_t) subtracted from the mean
            energy_grad = 0.0
            if guidance:
                energy_grad = jax.grad(
                    lambda p: energy_fn(p, edge_prev))(pos_pert)

            pos_prev = pg.pos_transition.get_prev_with(
                k_pos, pos_pert, pred_pos, g_cx0[i], g_cxt[i], g_std[i],
                is_final, energy_grad=energy_grad)

            carry = (key, pos_prev, node_prev, log_node_type,
                     edge_prev, log_edge_type)
            return carry, (pred_node, pred_pos, pred_edge)

        def step(carry, i):
            carry, _ = step_core(carry, i, is_final=False)
            ys = None
            if self.keep_traj:
                ys = (carry[2], carry[1] + batch.center[:, None, :],
                      carry[4])
            return carry, ys

        return step_core, step, S

    def _init_carry(self, key: jax.Array, batch: PhoreGraphBatch,
                    offset_init_by_center: bool):
        """Prior draws for pos/node/edge + the scan key -> initial carry."""
        pg = self.pg
        B, NL = batch.lig_type.shape
        k_init_pos, k_init_node, k_init_edge, k_scan = jax.random.split(key, 4)
        pos_init = pg.pos_transition.sample_init(k_init_pos, (B, NL, 3))
        if offset_init_by_center:
            pos_init = pos_init - batch.center[:, None, :]
        if pg.categorical_space == "discrete":
            node_init, _, log_node_init = pg.node_transition.sample_init(
                k_init_node, (B, NL))
            edge_init, _, log_edge_init = pg.edge_transition.sample_init(
                k_init_edge, (B, NL, NL))
            # slim carry: class ids (int8) instead of one-hots — the scan
            # state is what the runtime stages every iteration
            node_init = node_init.astype(jnp.int8)
            edge_init = edge_init.astype(jnp.int8)
        else:
            # relaxed one-hot Gaussian state (reference continuous mode)
            node_init = pg.node_transition.sample_init(k_init_node, (B, NL))
            edge_init = pg.edge_transition.sample_init(k_init_edge,
                                                       (B, NL, NL))
            log_node_init = jnp.zeros_like(node_init)
            log_edge_init = jnp.zeros_like(edge_init)
        return (k_scan, pos_init, node_init, log_node_init,
                edge_init, log_edge_init)

    def _package(self, batch: PhoreGraphBatch, carry, preds,
                 init_carry=None, ys=None) -> Dict[str, Any]:
        """Assemble the result dict from the post-final-step carry/preds."""
        mcfg = self.pg.config.model
        pred_node, pred_pos, pred_edge = preds
        pred_pos = pred_pos + batch.center[:, None, :]
        if not mcfg.bond_diffusion:
            pred_edge = None
        if self.pg.categorical_space == "discrete":
            onehot_node = lambda ids: jax.nn.one_hot(
                ids, mcfg.num_atom_classes, dtype=jnp.float32)
            onehot_edge = lambda ids: jax.nn.one_hot(
                ids, mcfg.num_bond_classes, dtype=jnp.float32)
        else:  # continuous: the carry already holds relaxed one-hots
            onehot_node = onehot_edge = lambda h: h.astype(jnp.float32)
        result = {
            "pred_node": pred_node,      # [B, NL, Ka] logits at t=0
            "pred_pos": pred_pos,        # [B, NL, 3] x_recon + center
            "pred_edge": pred_edge,      # [B, NL, NL, Kb] logits
            "lig_mask": batch.lig_mask,
            "final_state": {
                "pos": carry[1] + batch.center[:, None, :],
                "h_node": onehot_node(carry[2]),
                "h_edge": onehot_edge(carry[4]),
            },
        }
        if self.keep_traj and ys is not None and init_carry is not None:
            # trajectories as class ids (host decodes per frame); the final
            # t=0 state ran outside the scan, so append it explicitly
            fin = result["final_state"]
            pos_init, node_init, edge_init = (init_carry[1], init_carry[2],
                                              init_carry[4])
            result["traj"] = {
                "node": jnp.concatenate(
                    [node_init[None], ys[0], carry[2][None]], 0),
                "pos": jnp.concatenate(
                    [(pos_init + batch.center[:, None, :])[None], ys[1],
                     fin["pos"][None]], 0),
                "edge": jnp.concatenate(
                    [edge_init[None], ys[2], carry[4][None]], 0),
            }
        return result

    def sample(self, params, key: jax.Array, batch: PhoreGraphBatch,
               offset_init_by_center: bool = False) -> Dict[str, Any]:
        """Run the T-step reverse process for a padded sampling batch.

        `batch` carries the replicated pharmacophore and per-graph lig_mask
        (atom counts); ligand pos/type/bond content is ignored.
        Returns final prediction logits/positions and (optionally) the
        trajectory of sampled states.
        """
        step_core, step, S = self._reverse_parts(params, batch)
        carry0 = self._init_carry(key, batch, offset_init_by_center)
        # steps [0, S-1) in the scan; the t=0 step runs once outside so the
        # final preds triple never rides the per-iteration state
        carry, ys = jax.lax.scan(step, carry0, jnp.arange(S - 1),
                                 unroll=min(self.unroll, max(S - 1, 1)))
        carry, preds = step_core(carry, S - 1, is_final=True)
        return self._package(batch, carry, preds, carry0, ys)

    def sample_chunked(self, params, key: jax.Array, batch: PhoreGraphBatch,
                       chunk_steps: int,
                       offset_init_by_center: bool = False) -> Dict[str, Any]:
        """The exact same reverse process as `sample`, executed as
        ceil((S-1)/chunk) + 1 device calls with the carry left on device
        between calls — identical math and identical PRNG stream
        (parity-tested in tests/test_pipeline.py).

        Why it exists (TPU-first operational concern): some runtimes bound
        single-execution wall-time (e.g. this sandbox's tunneled relay kills
        executions past ~1 min, which is also what round 1 misread as a
        "B>=32 relay fault"), and chunking also bounds the per-call staged
        trajectory. On directly attached chips the extra dispatches cost
        microseconds; the single-scan `sample` remains the default there.
        """
        step_core, step, S = self._reverse_parts(params, batch)
        carry = self._init_carry(key, batch, offset_init_by_center)
        init_carry = carry
        n_body = S - 1
        chunk = max(1, min(chunk_steps, n_body))

        shape_key = (batch.lig_type.shape, batch.phore_x.shape,
                     self.sample_steps)
        fns = self._chunk_fns.get(shape_key)
        if fns is None:
            def run_chunk(params_, carry_, batch_, i0, n):
                _, st, _ = self._reverse_parts(params_, batch_)
                return jax.lax.scan(st, carry_, i0 + jnp.arange(n))

            def run_final(params_, carry_, batch_):
                sc, _, S_ = self._reverse_parts(params_, batch_)
                return sc(carry_, S_ - 1, is_final=True)

            # carry buffers are donated between chunks — except with
            # keep_traj, where _package still needs the init carry's buffers
            donate = () if self.keep_traj else (1,)
            fns = (jax.jit(run_chunk, static_argnums=(4,),
                           donate_argnums=donate),
                   jax.jit(run_final))
            self._chunk_fns[shape_key] = fns
        run_chunk, run_final = fns

        ys_parts = []
        i0 = 0
        while i0 < n_body:
            n = min(chunk, n_body - i0)
            carry, ys = run_chunk(params, carry, batch, jnp.int32(i0), n)
            if self.keep_traj:
                ys_parts.append(ys)
            i0 += n
        carry, preds = run_final(params, carry, batch)
        ys_all = None
        if self.keep_traj and ys_parts:
            ys_all = tuple(jnp.concatenate([p[k] for p in ys_parts], 0)
                           for k in range(3))
        return self._package(batch, carry, preds, init_carry, ys_all)
