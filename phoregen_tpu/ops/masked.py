"""Mask-aware dense primitives.

These replace the reference's torch_scatter segment ops (`scatter_softmax`,
`scatter_sum` in `models/uni_denoiser.py`) on the TPU's padded dense graphs:
a "segment" becomes an axis of a fixed-shape array and invalid slots carry a
boolean mask. All functions are jit-safe (static shapes, no data-dependent
control flow).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9
LOG_EPS = 1e-30
LOG_CLAMP = -32.0


def masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray, axis: int = -1,
                   ) -> jnp.ndarray:
    """Softmax over `axis` treating mask==False entries as -inf.

    Rows with no valid entry return all-zero weights (matching scatter_softmax
    semantics where empty segments simply receive no contribution).
    """
    scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=axis, keepdims=True)
    e = jnp.exp(scores - jax.lax.stop_gradient(m)) * mask.astype(scores.dtype)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    # Floor at 1.0, not LOG_EPS: any row with a valid entry has its argmax
    # lane at exp(0) = 1 so sum_e >= 1 and the clamp never binds
    # (bit-identical softmax); a fully-masked row still returns all-zero
    # weights, now with a finite VJP — with a tiny eps the division
    # backward forms 1/denom^2 which overflows/underflows f32 and can
    # produce NaN gradients (see ops/layer_stack.py::_softmax_masked,
    # round-5 fused-stack NaN fix).
    return e / jnp.maximum(denom, 1.0)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None,
                keepdims: bool = False) -> jnp.ndarray:
    """Mean of `x` over entries where mask is True (0 if none)."""
    mask = mask.astype(x.dtype)
    num = jnp.sum(x * mask, axis=axis, keepdims=keepdims)
    den = jnp.sum(mask, axis=axis, keepdims=keepdims)
    return num / jnp.maximum(den, 1e-12)


def masked_sum(x: jnp.ndarray, mask: jnp.ndarray, axis=None,
               keepdims: bool = False) -> jnp.ndarray:
    return jnp.sum(x * mask.astype(x.dtype), axis=axis, keepdims=keepdims)


def masked_logsumexp(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -1,
                     keepdims: bool = False) -> jnp.ndarray:
    x = jnp.where(mask, x, NEG_INF)
    return jax.nn.logsumexp(x, axis=axis, keepdims=keepdims)


# ----- log-space categorical utilities -----
# Parity with reference `models/common.py:396-440`.

def index_to_log_onehot(x: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    onehot = jax.nn.one_hot(x, num_classes, dtype=jnp.float32)
    return jnp.log(jnp.clip(onehot, LOG_EPS, None))


def log_sample_categorical(key: jax.Array, logits: jnp.ndarray) -> jnp.ndarray:
    """Gumbel-max sample over the last axis (reference `common.py:425-431`)."""
    uniform = jax.random.uniform(key, logits.shape, dtype=logits.dtype)
    gumbel = -jnp.log(-jnp.log(uniform + LOG_EPS) + LOG_EPS)
    return jnp.argmax(gumbel + logits, axis=-1)


def categorical_kl(log_prob1: jnp.ndarray, log_prob2: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.exp(log_prob1) * (log_prob1 - log_prob2), axis=-1)


def log_categorical(log_x_start: jnp.ndarray, log_prob: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.exp(log_x_start) * log_prob, axis=-1)


def clamped_log(x: jnp.ndarray, eps: float = LOG_EPS) -> jnp.ndarray:
    """log(x + eps) clamped below at -32, the reference's numerical guard
    (`models/transition.py:271,311`)."""
    return jnp.clip(jnp.log(x + eps), LOG_CLAMP, None)
