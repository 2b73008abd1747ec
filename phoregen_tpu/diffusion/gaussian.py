"""Gaussian (DDPM) transition for continuous variables.

Parity target: reference `models/transition.py:9-69` (`ContigousTransition`):
precomputed alpha-bar tables, q(x_t|x_0) sampling, and the posterior step
`mu = coef_x0 * x_recon + coef_xt * x_t - energy_grad` with the t==0 override
returning the mean.

Padded-batch layout: all state arrays are [B, ...] with the graph index as the
leading axis; the per-graph timestep is t: [B] int32 and coefficient lookups
broadcast over the trailing axes (replaces the reference's per-node
`extract(coef, t, batch)` gather).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _bcast(coef_t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """[B] -> [B, 1, ..., 1] with `ndim` total dims."""
    return coef_t.reshape(coef_t.shape + (1,) * (ndim - 1))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GaussianTransition:
    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_bar: jnp.ndarray
    alphas_bar_prev: jnp.ndarray
    coef_x0: jnp.ndarray
    coef_xt: jnp.ndarray
    std: jnp.ndarray
    num_classes: int | None = None
    scaling: float = 1.0

    # -- pytree plumbing (tables are leaves; metadata static) --
    def tree_flatten(self):
        leaves = (self.betas, self.alphas, self.alphas_bar,
                  self.alphas_bar_prev, self.coef_x0, self.coef_xt, self.std)
        return leaves, (self.num_classes, self.scaling)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, num_classes=aux[0], scaling=aux[1])

    @classmethod
    def create(cls, betas: np.ndarray, num_classes: int | None = None,
               scaling: float = 1.0) -> "GaussianTransition":
        betas = np.asarray(betas, dtype=np.float64)
        alphas = 1.0 - betas
        alphas_bar = np.cumprod(alphas, axis=0)
        alphas_bar_prev = np.concatenate([[1.0], alphas_bar[:-1]])
        coef_x0 = np.sqrt(alphas_bar_prev) * betas / (1 - alphas_bar)
        coef_xt = np.sqrt(alphas) * (1 - alphas_bar_prev) / (1 - alphas_bar)
        std = np.sqrt((1 - alphas_bar_prev) * betas / (1 - alphas_bar))
        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(f32(betas), f32(alphas), f32(alphas_bar),
                   f32(alphas_bar_prev), f32(coef_x0), f32(coef_xt), f32(std),
                   num_classes=num_classes, scaling=scaling)

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    def add_noise(self, key: jax.Array, x: jnp.ndarray, t: jnp.ndarray):
        """Sample x_t ~ q(x_t | x_0) = sqrt(ab) x0 + sqrt(1-ab) eps.

        x: [B, ...] (continuous) or [B, ...] int (categorical -> one-hot).
        t: [B]. Returns x_t (and x0 as one-hot/scaled when categorical).
        """
        if self.num_classes is not None:
            x = jax.nn.one_hot(x, self.num_classes, dtype=jnp.float32)
        x = x / self.scaling
        a_bar = _bcast(self.alphas_bar[t], x.ndim)
        noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        pert = jnp.sqrt(a_bar) * x + jnp.sqrt(1.0 - a_bar) * noise
        if self.num_classes is None:
            return pert
        return pert, x

    def get_prev_from_recon(self, key: jax.Array, x_t: jnp.ndarray,
                            x_recon: jnp.ndarray, t: jnp.ndarray,
                            energy_grad: jnp.ndarray | float = 0.0,
                            ) -> jnp.ndarray:
        """One reverse step: sample x_{t-1} ~ q(x_{t-1} | x_t, x_0=x_recon).

        The guidance hook subtracts `energy_grad` from the posterior mean
        (reference `models/transition.py:57`); at t==0 the mean is returned.
        """
        coef_x0 = _bcast(self.coef_x0[t], x_t.ndim)
        coef_xt = _bcast(self.coef_xt[t], x_t.ndim)
        mu = coef_x0 * x_recon + coef_xt * x_t - energy_grad
        sigma = _bcast(self.std[t], x_t.ndim)
        noise = jax.random.normal(key, mu.shape, dtype=mu.dtype)
        x_prev = mu + sigma * noise
        time_zero = _bcast(t == 0, x_t.ndim)
        return jnp.where(time_zero, mu, x_prev)

    def sample_init(self, key: jax.Array, shape) -> jnp.ndarray:
        if self.num_classes is not None:
            shape = tuple(shape) + (self.num_classes,)
        return jax.random.normal(key, tuple(shape), dtype=jnp.float32)

    def get_prev_with(self, key: jax.Array, x_t: jnp.ndarray,
                      x_recon: jnp.ndarray, coef_x0: jnp.ndarray,
                      coef_xt: jnp.ndarray, std: jnp.ndarray,
                      is_final: jnp.ndarray,
                      energy_grad: jnp.ndarray | float = 0.0) -> jnp.ndarray:
        """Reverse step with explicit per-step scalar coefficients (strided
        sampling); `is_final` returns the mean (the reference t==0 case)."""
        mu = coef_x0 * x_recon + coef_xt * x_t - energy_grad
        noise = jax.random.normal(key, mu.shape, dtype=mu.dtype)
        x_prev = mu + std * noise
        return jnp.where(is_final, mu, x_prev)


def build_gaussian_strided(betas: np.ndarray, timesteps: np.ndarray):
    """Per-step posterior coefficients for strided sampling.

    timesteps: descending ints ending at 0. For each reverse step
    t_i -> t_{i+1}: q(x_{t_prev} | x_t, x_0) is the exact DDPM posterior over
    the strided interval with ᾱ ratios replacing per-step α
    (reduces to the reference 1-step coefficients when the stride is 1).
    The final entry (t = 0) carries the reference's t==0 coefficients
    (ᾱ_prev = 1) and is consumed with the mean-only override.

    Returns (coef_x0, coef_xt, std) each [S] float32.
    """
    betas = np.asarray(betas, np.float64)
    ab = np.cumprod(1.0 - betas)
    ts = np.asarray(timesteps, np.int64)
    assert ts[-1] == 0 and (np.diff(ts) < 0).all()
    coef_x0, coef_xt, std = [], [], []
    for i in range(len(ts)):
        t = int(ts[i])
        ab_t = ab[t]
        ab_p = ab[int(ts[i + 1])] if i + 1 < len(ts) else 1.0  # t==0 step
        ratio = ab_t / ab_p
        coef_x0.append(np.sqrt(ab_p) * (1.0 - ratio) / (1.0 - ab_t))
        coef_xt.append(np.sqrt(ratio) * (1.0 - ab_p) / (1.0 - ab_t))
        std.append(np.sqrt((1.0 - ab_p) / (1.0 - ab_t) * (1.0 - ratio)))
    f32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
    return f32(coef_x0), f32(coef_xt), f32(std)
