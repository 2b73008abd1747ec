"""Mixture-density-network atom-count utilities.

Parity target: `mdn_loss` / `sample_from_mdn`
(reference `models/model_utils.py:436-466`). In the reference these are
dormant: `PhoreDiff.count_pred_type` only accepts `'boundary'`
(`models/diffusion.py:80-86`), so no shipped config ever reaches the MDN
head. They are provided here for inventory parity and for experiments with
distributional count heads.

TPU-first divergences (documented):
- the NLL is computed with logsumexp instead of the reference's
  exp(log_prob)->sum->log (identical math, no underflow at small
  densities);
- the reference's NaN guards (`model_utils.py:438-439,456-458`) are
  unnecessary under a log-space formulation and are replaced by a sigma
  floor.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG_2PI = 1.8378770664093453
SIGMA_FLOOR = 1e-6


def mdn_loss(label: jnp.ndarray, mu: jnp.ndarray, sigma: jnp.ndarray,
             pi: jnp.ndarray) -> jnp.ndarray:
    """Mean negative log-likelihood of `label` under the Gaussian mixture.

    label: [B]; mu/sigma: [B, K]; pi: [B, K] (rows sum to 1).
    Matches reference `mdn_loss` (`models/model_utils.py:436-445`) up to
    the log-space reformulation.
    """
    sigma = jnp.maximum(sigma, SIGMA_FLOOR)
    z = (label[:, None] - mu) / sigma
    log_comp = -0.5 * (z * z + _LOG_2PI) - jnp.log(sigma)
    log_mix = jax.nn.logsumexp(log_comp + jnp.log(pi + 1e-16), axis=1)
    return -jnp.mean(log_mix)


def sample_from_mdn(key: jax.Array, mu: jnp.ndarray, sigma: jnp.ndarray,
                    pi: jnp.ndarray) -> jnp.ndarray:
    """Draw one count per row: component ~ Categorical(pi), then
    mu_k + sigma_k * eps (reference `sample_from_mdn`,
    `models/model_utils.py:454-466`). Returns [B]."""
    B, K = pi.shape
    k_cat, k_eps = jax.random.split(key)
    comp = jax.random.categorical(k_cat, jnp.log(pi + 1e-16), axis=-1)  # [B]
    eps = jax.random.normal(k_eps, (B,))
    mu_sel = jnp.take_along_axis(mu, comp[:, None], axis=1)[:, 0]
    sig_sel = jnp.take_along_axis(sigma, comp[:, None], axis=1)[:, 0]
    return mu_sel + sig_sel * eps
