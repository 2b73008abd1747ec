"""Validity-guidance energy parity vs the reference's own functions.

Runs `compute_batch_atom_prox_loss` / `compute_batch_center_prox_loss`
(reference `utils/sample_utils.py:135-165`) on CPU torch against our
in-scan energies (`phoregen_tpu/sample/sampler.py`), on identical padded
vs flat inputs. The energies drive the gradient guidance in the reverse
loop (reference `models/diffusion.py:476-502`).
"""
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("PHOREGEN_REFERENCE_PATH", "/root/reference")

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REFERENCE, "utils")):
    pytest.skip(f"reference checkout not found at {REFERENCE}",
                allow_module_level=True)

import pyg_shims

pyg_shims.install(REFERENCE)

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def _padded_case(seed, B=2, NL=7):
    rng = np.random.default_rng(seed)
    lig_mask = np.zeros((B, NL), bool)
    lig_mask[0, :5] = True
    lig_mask[1, :NL] = True
    pos = rng.normal(scale=2.0, size=(B, NL, 3)).astype(np.float32)
    h_edge = rng.normal(size=(B, NL, NL, 6)).astype(np.float32)
    eye = np.eye(NL, dtype=bool)
    bond_mask = lig_mask[:, :, None] & lig_mask[:, None, :] & ~eye
    return lig_mask, pos, h_edge, bond_mask


def _flat(lig_mask, pos, h_edge):
    B, NL = lig_mask.shape
    fpos, batch, fedge, ei, ebatch = [], [], [], [], []
    off = 0
    for g in range(B):
        valid = np.flatnonzero(lig_mask[g])
        n = len(valid)
        fpos.append(pos[g, valid])
        batch += [g] * n
        for a in range(n):
            for b in range(n):
                if a != b:
                    ei.append((off + a, off + b))
                    fedge.append(h_edge[g, valid[a], valid[b]])
                    ebatch.append(g)
        off += n
    return (torch.tensor(np.concatenate(fpos)),
            torch.tensor(batch),
            torch.tensor(np.stack(fedge)),
            torch.tensor(np.asarray(ei).T),
            torch.tensor(ebatch))


def test_atom_prox_parity():
    from utils.sample_utils import compute_batch_atom_prox_loss

    from phoregen_tpu.sample.sampler import atom_prox_energy

    lig_mask, pos, h_edge, bond_mask = _padded_case(3)
    fpos, batch, fedge, ei, ebatch = _flat(lig_mask, pos, h_edge)
    ref = compute_batch_atom_prox_loss(fpos, batch, fedge, ei, ebatch,
                                       min_d=1.0, max_d=3.0)
    ours = atom_prox_energy(jnp.asarray(pos), jnp.asarray(h_edge),
                            jnp.asarray(bond_mask), jnp.asarray(lig_mask),
                            1.0, 3.0)
    np.testing.assert_allclose(float(ref), float(ours), rtol=1e-5,
                               atol=1e-6)


def test_atom_prox_parity_no_bonds():
    """Edge case: no predicted bonds at all (reference returns 0)."""
    from utils.sample_utils import compute_batch_atom_prox_loss

    from phoregen_tpu.sample.sampler import atom_prox_energy

    lig_mask, pos, h_edge, bond_mask = _padded_case(4)
    # force argmax to class 0 (no bond) everywhere
    h_edge[..., 0] = 10.0
    fpos, batch, fedge, ei, ebatch = _flat(lig_mask, pos, h_edge)
    ref = compute_batch_atom_prox_loss(fpos, batch, fedge, ei, ebatch,
                                       min_d=1.0, max_d=3.0)
    ours = atom_prox_energy(jnp.asarray(pos), jnp.asarray(h_edge),
                            jnp.asarray(bond_mask), jnp.asarray(lig_mask),
                            1.0, 3.0)
    np.testing.assert_allclose(float(ref), float(ours), atol=1e-7)


def test_center_prox_parity():
    from utils.sample_utils import compute_batch_center_prox_loss

    from phoregen_tpu.sample.sampler import center_prox_energy

    lig_mask, pos, _, _ = _padded_case(5)
    center = np.asarray([0.3, -0.7, 1.1], np.float32)
    fpos, batch = _flat(lig_mask, pos, np.zeros(lig_mask.shape + (lig_mask.shape[1], 6), np.float32))[:2]
    ref = compute_batch_center_prox_loss(fpos, batch, torch.tensor(center))
    ours = center_prox_energy(jnp.asarray(pos), jnp.asarray(lig_mask),
                              jnp.asarray(center)[None])
    np.testing.assert_allclose(float(ref), float(ours), rtol=1e-5,
                               atol=1e-6)
