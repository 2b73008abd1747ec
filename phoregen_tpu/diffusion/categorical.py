"""D3PM-style categorical transition with configurable absorbing priors.

Parity target: reference `models/transition.py:178-339`
(`GeneralCategoricalTransition`):
- per-step K x K transition matrices toward an `init_prob` prior
  ('tomask' / 'absorb' / 'uniform' / custom), built in float64 on the host;
- cumulative q_mats by matrix product;
- posterior q(v_{t-1} | v_t, v_0) via products with the transposed one-step
  matrices, with log(x+eps).clamp(-32) guards and the t==0 -> log_v0 override;
- KL / decoder-NLL loss split at t==0 (`compute_v_Lt`);
- prior sampling (`sample_init`).

Padded-batch layout: v lives on [B, ...] grids (e.g. [B, N] atoms or
[B, N, N] dense bonds); t is per-graph [B].
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.masked import (clamped_log, categorical_kl, log_categorical,
                          index_to_log_onehot, log_sample_categorical)

EPS = 1e-30


def build_init_prob(num_classes: int, init_prob: Union[str, np.ndarray, None]
                    ) -> np.ndarray:
    if init_prob is None or init_prob == "uniform":
        p = np.ones(num_classes) / num_classes
    elif init_prob == "absorb":  # absorb into class 0 (no-bond)
        p = 0.01 * np.ones(num_classes)
        p[0] = 1.0
        p = p / p.sum()
    elif init_prob == "tomask":  # absorb into the trailing mask class
        p = 0.001 * np.ones(num_classes)
        p[-1] = 1.0
        p = p / p.sum()
    else:
        p = np.asarray(init_prob, dtype=np.float64)
        p = p / p.sum()
    return p


def _one_step_mats(betas: np.ndarray, prob: np.ndarray):
    """Per-step Q_t and cumulative Q-bar_t (host-side float64) — the one
    construction shared by training tables and strided-sampling tables."""
    num_classes = prob.shape[0]
    one_step = []
    for beta_t in betas:
        mat = beta_t * np.repeat(prob[None, :], num_classes, axis=0)
        mat = mat + np.eye(num_classes) * (1.0 - beta_t)
        one_step.append(mat)
    cum = [one_step[0]]
    for t in range(1, len(betas)):
        cum.append(cum[-1] @ one_step[t])
    return np.stack(one_step, axis=0), np.stack(cum, axis=0)


def build_transition_mats(betas: np.ndarray, num_classes: int,
                          init_prob: Union[str, np.ndarray, None]):
    """Host-side float64 construction of Q_t, cumulative Q-bar_t, Q_t^T."""
    prob = build_init_prob(num_classes, init_prob)
    one_step, q_mats = _one_step_mats(betas, prob)
    transpose_one_step = np.transpose(one_step, (0, 2, 1))
    return prob, q_mats, transpose_one_step


def _texp(t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    return t.reshape(t.shape + (1,) * (ndim - 1))


def _mix(p: jnp.ndarray, mats: jnp.ndarray) -> jnp.ndarray:
    """out[b, ..., k] = sum_j p[b, ..., j] * mats[b, j, k].

    Deliberately NOT an einsum/dot_general: the contraction is over a tiny
    class axis (K=6 or 12) batched over the whole [B, N(, N)] grid, and on
    TPU XLA lowers that as thousands of MXU-padded 6x6 matmuls (~13 ms per
    reverse-diffusion step measured at B=8). The broadcast-multiply-reduce
    form stays on the VPU and is ~100x faster here.
    """
    M = mats.reshape(mats.shape[:1] + (1,) * (p.ndim - 2) + mats.shape[1:])
    return jnp.sum(p[..., :, None] * M, axis=-2)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CategoricalTransition:
    q_mats: jnp.ndarray              # [T, K, K] cumulative
    transpose_q_onestep: jnp.ndarray  # [T, K, K]
    init_logprob: jnp.ndarray        # [K]
    num_classes: int

    def tree_flatten(self):
        return (self.q_mats, self.transpose_q_onestep, self.init_logprob), \
            (self.num_classes,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, num_classes=aux[0])

    @classmethod
    def create(cls, betas: np.ndarray, num_classes: int,
               init_prob: Union[str, np.ndarray, None] = None,
               ) -> "CategoricalTransition":
        prob, q_mats, tq = build_transition_mats(
            np.asarray(betas, np.float64), num_classes, init_prob)
        init_logprob = np.clip(np.log(prob + EPS), -32.0, None)
        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(f32(q_mats), f32(tq), f32(init_logprob), num_classes)

    @property
    def num_timesteps(self) -> int:
        return self.q_mats.shape[0]

    # ----- forward (noising) -----
    def q_vt_pred(self, log_v0: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """log q(v_t | v_0). log_v0: [B, ..., K], t: [B]."""
        qt = self.q_mats[t]  # [B, K, K]
        q_vt = _mix(jnp.exp(log_v0), qt)
        return clamped_log(q_vt)

    def q_vt_sample(self, key: jax.Array, log_v0: jnp.ndarray, t: jnp.ndarray):
        log_q = self.q_vt_pred(log_v0, t)
        sample_class = log_sample_categorical(key, log_q)
        return sample_class, index_to_log_onehot(sample_class, self.num_classes)

    def add_noise(self, key: jax.Array, v: jnp.ndarray, t: jnp.ndarray):
        """v: [B, ...] int class ids; returns (one-hot v_t, log v_t, log v_0)."""
        log_v0 = index_to_log_onehot(v, self.num_classes)
        v_pert, log_vt = self.q_vt_sample(key, log_v0, t)
        return jax.nn.one_hot(v_pert, self.num_classes, dtype=jnp.float32), \
            log_vt, log_v0

    def onehot_encode(self, v: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.one_hot(v, self.num_classes, dtype=jnp.float32)

    # ----- reverse (posterior) -----
    def q_v_posterior(self, log_v0: jnp.ndarray, log_vt: jnp.ndarray,
                      t: jnp.ndarray, v0_prob: bool = True) -> jnp.ndarray:
        """log q(v_{t-1} | v_t, v_0); t==0 entries return log_v0 directly."""
        t_minus_1 = jnp.maximum(t - 1, 0)
        fact1_mat = self.transpose_q_onestep[t]  # [B, K, K]
        fact1 = _mix(jnp.exp(log_vt), fact1_mat)
        fact2_mat = self.q_mats[t_minus_1]
        if v0_prob:
            fact2 = _mix(jnp.exp(log_v0), fact2_mat)
        else:
            v0_onehot = jax.nn.one_hot(jnp.argmax(log_v0, axis=-1),
                                       self.num_classes, dtype=jnp.float32)
            fact2 = _mix(v0_onehot, fact2_mat)
        out = clamped_log(fact1) + clamped_log(fact2)
        out = out - jax.nn.logsumexp(out, axis=-1, keepdims=True)
        time_zero = _texp(t == 0, out.ndim)
        return jnp.where(time_zero, log_v0, out)

    def compute_v_Lt(self, log_post_true: jnp.ndarray,
                     log_post_pred: jnp.ndarray, log_v0: jnp.ndarray,
                     t: jnp.ndarray) -> jnp.ndarray:
        """Per-entry loss: KL(true || pred), or decoder NLL where t==0."""
        kl_v = categorical_kl(log_post_true, log_post_pred)
        decoder_nll = -log_categorical(log_v0, log_post_pred)
        mask = _texp((t == 0).astype(kl_v.dtype), kl_v.ndim)
        return mask * decoder_nll + (1.0 - mask) * kl_v

    def q_v_posterior_mats(self, log_v0: jnp.ndarray, log_vt: jnp.ndarray,
                           trans_T: jnp.ndarray, cum_prev: jnp.ndarray,
                           is_final: jnp.ndarray) -> jnp.ndarray:
        """Posterior with explicit (possibly multi-step) [K,K] matrices
        shared across the batch (strided sampling); `is_final` returns
        log_v0 (the reference t==0 override)."""
        fact1 = jnp.sum(jnp.exp(log_vt)[..., :, None] * trans_T, axis=-2)
        fact2 = jnp.sum(jnp.exp(log_v0)[..., :, None] * cum_prev, axis=-2)
        out = clamped_log(fact1) + clamped_log(fact2)
        out = out - jax.nn.logsumexp(out, axis=-1, keepdims=True)
        return jnp.where(is_final, log_v0, out)

    def sample_init(self, key: jax.Array, shape):
        """Sample v_T from the stationary prior over a [B, ...] grid."""
        logits = jnp.broadcast_to(self.init_logprob,
                                  tuple(shape) + (self.num_classes,))
        init_types = log_sample_categorical(key, logits)
        init_onehot = self.onehot_encode(init_types)
        log_vt = index_to_log_onehot(init_types, self.num_classes)
        return init_types, init_onehot, log_vt


def build_strided_tables(betas: np.ndarray, num_classes: int,
                         init_prob, timesteps: np.ndarray):
    """Exact multi-step posterior tables for strided (DDIM-style) sampling.

    timesteps: descending ints ending at 0, e.g. [999, 899, ..., 99, 0].
    For each reverse step t_i -> t_{i+1} the posterior is
        q(v_{t_prev} | v_t, v_0) ∝ (Q_{t_prev->t}^T v_t) ⊙ (Q̄_{t_prev} v_0)
    with Q_{t_prev->t} = Π_{s=t_prev+1..t} Q_s — the same identity the
    1-step reference posterior uses (`models/transition.py:285-315`),
    evaluated over the strided interval, so striding is exact w.r.t. the
    forward process (only the number of denoiser evaluations changes).

    Returns (trans_T [S-1,K,K], cum_prev [S-1,K,K]) as float32 jnp arrays,
    indexed by reverse-step i (step S-1, at t=0, uses the recon override and
    needs no tables).
    """
    betas = np.asarray(betas, np.float64)
    prob = build_init_prob(num_classes, init_prob)
    one_step, cum = _one_step_mats(betas, prob)

    ts = np.asarray(timesteps, np.int64)
    assert ts[-1] == 0 and (len(ts) == 1 or (np.diff(ts) < 0).all()), \
        "timesteps must descend to 0"
    trans_T, cum_prev = [], []
    for i in range(len(ts) - 1):
        t, tp = int(ts[i]), int(ts[i + 1])
        q = np.eye(num_classes)
        for s in range(tp + 1, t + 1):
            q = q @ one_step[s]
        trans_T.append(q.T)
        # Q̄_{t_prev} (the reference's q_mats[max(t-1, 0)] convention keeps
        # cum[0] for t_prev == 0)
        cum_prev.append(cum[tp])
    f32 = lambda a: jnp.asarray(np.stack(a), jnp.float32)
    K = num_classes
    if not trans_T:  # S == 1: only the final recon-override step runs
        empty = jnp.zeros((0, K, K), jnp.float32)
        return empty, empty
    return f32(trans_T), f32(cum_prev)


def _log1m_exp(log_a: np.ndarray) -> np.ndarray:
    """log(1 - exp(log_a)), stable (host-side float64)."""
    return np.log1p(-np.exp(log_a) + 1e-40)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class UniformCategoricalTransition:
    """Legacy log-space uniform-prior categorical diffusion.

    Parity: reference `models/transition.py:72-175` (`CategoricalTransition`)
    — defined but not selected by the shipped configs; kept for completeness.
    Closed-form ᾱ mixing with the uniform distribution instead of per-step
    transition matrices: q(v_t|v_0) = ᾱ_t v_0 + (1-ᾱ_t)/K.
    """
    log_alphas: jnp.ndarray            # [T]
    log_1m_alphas: jnp.ndarray
    log_alphas_bar: jnp.ndarray
    log_1m_alphas_bar: jnp.ndarray
    num_classes: int

    def tree_flatten(self):
        return (self.log_alphas, self.log_1m_alphas, self.log_alphas_bar,
                self.log_1m_alphas_bar), (self.num_classes,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, num_classes=aux[0])

    @classmethod
    def create(cls, betas: np.ndarray, num_classes: int
               ) -> "UniformCategoricalTransition":
        betas = np.asarray(betas, np.float64)
        log_alphas = np.log(1.0 - betas)
        log_alphas_bar = np.cumsum(log_alphas)
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        return cls(f32(log_alphas), f32(_log1m_exp(log_alphas)),
                   f32(log_alphas_bar), f32(_log1m_exp(log_alphas_bar)),
                   num_classes)

    def q_vt_pred(self, log_v0: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        la = _texp(self.log_alphas_bar[t], log_v0.ndim)
        l1a = _texp(self.log_1m_alphas_bar[t], log_v0.ndim)
        return jnp.logaddexp(log_v0 + la, l1a - np.log(self.num_classes))

    def q_v_pred_one_timestep(self, log_vt: jnp.ndarray, t: jnp.ndarray
                              ) -> jnp.ndarray:
        la = _texp(self.log_alphas[t], log_vt.ndim)
        l1a = _texp(self.log_1m_alphas[t], log_vt.ndim)
        return jnp.logaddexp(log_vt + la, l1a - np.log(self.num_classes))

    def add_noise(self, key: jax.Array, v: jnp.ndarray, t: jnp.ndarray):
        log_v0 = index_to_log_onehot(v, self.num_classes)
        log_q = self.q_vt_pred(log_v0, t)
        v_pert = log_sample_categorical(key, log_q)
        log_vt = index_to_log_onehot(v_pert, self.num_classes)
        return jax.nn.one_hot(v_pert, self.num_classes, dtype=jnp.float32), \
            log_vt, log_v0

    def onehot_encode(self, v: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.one_hot(v, self.num_classes, dtype=jnp.float32)

    def q_v_posterior(self, log_v0: jnp.ndarray, log_vt: jnp.ndarray,
                      t: jnp.ndarray, v0_prob: bool = True) -> jnp.ndarray:
        # v0_prob=False hardens log_v0 to its argmax one-hot before mixing
        # (same extension semantics as CategoricalTransition.q_v_posterior;
        # the reference's legacy class has no such switch)
        if not v0_prob:
            log_v0 = clamped_log(jax.nn.one_hot(
                jnp.argmax(log_v0, axis=-1), self.num_classes,
                dtype=jnp.float32))
        t_minus_1 = jnp.maximum(t - 1, 0)
        log_qvtmin = self.q_vt_pred(log_v0, t_minus_1)
        time_zero = _texp(t == 0, log_v0.ndim)
        log_qvtmin = jnp.where(time_zero, log_v0, log_qvtmin)
        unnormed = log_qvtmin + self.q_v_pred_one_timestep(log_vt, t)
        return unnormed - jax.nn.logsumexp(unnormed, axis=-1, keepdims=True)

    def compute_v_Lt(self, log_post_true, log_post_pred, log_v0, t):
        kl_v = categorical_kl(log_post_true, log_post_pred)
        decoder_nll = -log_categorical(log_v0, log_post_pred)
        mask = _texp((t == 0).astype(kl_v.dtype), kl_v.ndim)
        return mask * decoder_nll + (1.0 - mask) * kl_v

    def sample_init(self, key: jax.Array, shape):
        logits = jnp.zeros(tuple(shape) + (self.num_classes,))
        init_types = log_sample_categorical(key, logits)
        return init_types, self.onehot_encode(init_types), \
            index_to_log_onehot(init_types, self.num_classes)
