"""Host-side data augmentations (numpy, applied per fetch in the loader).

Parity target: `AddPhoreNoise` (reference `datasets/transform.py:440-480`):
Gaussian position noise (std 0.1) on pharmacophore points plus a random
rotation of each norm vector by up to `angle` degrees about a random axis.
`FeaturizeLigandBond` (reference `datasets/transform.py:483-501`) needs no
transform here: the dense [NL, NL] bond grid *is* the fully-connected directed
edge set (off-diagonal), built directly in `pad_sample`.
"""
from __future__ import annotations

import numpy as np


def _rotation_matrix(axis: np.ndarray, theta: float) -> np.ndarray:
    """Rodrigues rotation about `axis` by `theta` radians."""
    axis = axis / (np.linalg.norm(axis) + 1e-12)
    kx, ky, kz = axis
    K = np.array([[0, -kz, ky], [kz, 0, -kx], [-ky, kx, 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def add_phore_noise(rng: np.random.Generator, phore_pos: np.ndarray,
                    phore_norm: np.ndarray, noise_std: float = 0.1,
                    angle_deg: float = 5.0):
    """Returns (noisy_pos, rotated_norms); norms stay unit-length, zero norms
    stay zero (no-norm points)."""
    pos = phore_pos + rng.normal(scale=noise_std,
                                 size=phore_pos.shape).astype(np.float32)
    norms = phore_norm.copy()
    has = np.linalg.norm(phore_norm, axis=-1) > 1e-6
    for i in np.where(has)[0]:
        axis = rng.normal(size=3)
        theta = np.deg2rad(rng.uniform(-angle_deg, angle_deg))
        norms[i] = (_rotation_matrix(axis, theta) @ norms[i]).astype(
            np.float32)
    return pos.astype(np.float32), norms
