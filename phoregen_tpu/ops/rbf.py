"""Radial/temporal/angular basis encodings (pure functions of arrays).

Parity targets:
- `GaussianSmearing` with a fixed non-uniform 20-point offset grid or a
  uniform linspace grid (reference `models/common.py:11-31`).
- `TimeGaussianSmearing` linear/exponential time grid
  (reference `models/common.py:34-55`).
- `AngularEncoding` sin/cos frequency bands (reference `models/common.py:67-87`).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import FIXED_RBF_OFFSETS


def gaussian_smearing_offsets(start: float = 0.0, stop: float = 5.0,
                              num_gaussians: int = 50, fix_offset: bool = True):
    """Return (offsets, coeff) for the RBF; coeff = -0.5 / (off1-off0)^2."""
    if fix_offset:
        offset = np.asarray(FIXED_RBF_OFFSETS, dtype=np.float32)
    else:
        offset = np.linspace(start, stop, num_gaussians, dtype=np.float32)
    coeff = -0.5 / float(offset[1] - offset[0]) ** 2
    return offset, coeff


def gaussian_smearing(dist: jnp.ndarray, offset: jnp.ndarray, coeff: float
                      ) -> jnp.ndarray:
    """exp(coeff * (d - mu_k)^2) over the trailing offset axis.

    dist: [...], returns [..., num_gaussians].
    """
    d = dist[..., None] - offset
    return jnp.exp(coeff * d * d)


def time_smearing_offsets(start: float = 0.0, stop: float = 10.0,
                          num_gaussians: int = 50, type_: str = "linear"):
    """Return (offsets, coeffs[num_gaussians]) for the time embedding."""
    if type_ == "exp":
        offset = np.exp(np.linspace(np.log(start + 1), np.log(stop + 1),
                                    num_gaussians)) - 1
    elif type_ == "linear":
        offset = np.linspace(start, stop, num_gaussians)
    else:
        raise NotImplementedError("type_ must be either exp or linear")
    diff = np.diff(offset)
    diff = np.concatenate([diff[:1], diff])
    coeff = -0.5 / (diff ** 2)
    return offset.astype(np.float32), coeff.astype(np.float32)


def time_smearing(t: jnp.ndarray, offset: jnp.ndarray, coeff: jnp.ndarray,
                  start: float, stop: float) -> jnp.ndarray:
    """Clamped Gaussian grid time embedding: t [...] -> [..., num_gaussians]."""
    t = jnp.clip(t.astype(jnp.float32), start, stop)
    d = t[..., None] - offset
    return jnp.exp(coeff * d * d)


def angular_encoding_freq_bands(num_funcs: int = 3) -> np.ndarray:
    return np.asarray([i + 1 for i in range(num_funcs)]
                      + [1.0 / (i + 1) for i in range(num_funcs)],
                      dtype=np.float32)


def angular_encoding(x: jnp.ndarray, freq_bands: jnp.ndarray) -> jnp.ndarray:
    """x [...] -> [..., 1 + 4*num_funcs] = [x, sin(x*f), cos(x*f)]."""
    xe = x[..., None]
    return jnp.concatenate(
        [xe, jnp.sin(xe * freq_bands), jnp.cos(xe * freq_bands)], axis=-1)


def angular_encoding_dim(num_funcs: int = 3) -> int:
    return 1 + 2 * 2 * num_funcs
