"""Accessible-surface and lipophilicity scoring (AncPhore-style).

Behavioral equivalent of the reference's surface/lipophilicity routines
(`datasets/generate_phorefp.py:259-448`: `calAccSurf`, `labelLipoAtoms`,
`hy_check(follow_ancphore=True)`), re-implemented independently:

- accessible surface fraction by uniform sphere sampling (Fibonacci lattice,
  vectorized numpy, instead of the reference's layered arc grid);
- per-atom lipophilicity contributions (rule-based, AncPhore-like: aliphatic
  carbons and halogens contribute, atoms adjacent to charged/polar centers
  are suppressed), scaled by exposed surface;
- hydrophobic group detection: rings (<7 atoms) and >=3-H centers whose
  summed lipophilicity exceeds the 9.87 threshold become HY feature points.

The geometry core is toolkit-free; group detection needs RDKit (gated).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

# van der Waals radii (angstrom) for the supported heavy elements + H
VDW_RADII = {1: 1.2, 5: 1.92, 6: 1.7, 7: 1.55, 8: 1.52, 9: 1.47, 14: 2.1,
             15: 1.8, 16: 1.8, 17: 1.75, 35: 1.85, 53: 1.98}
LIPO_THRESHOLD = 9.87  # AncPhore hydrophobic-group cutoff


def fibonacci_sphere(n: int) -> np.ndarray:
    """n approximately-uniform unit vectors."""
    i = np.arange(n) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (1.0 + 5 ** 0.5) * i
    return np.stack([np.cos(theta) * np.sin(phi),
                     np.sin(theta) * np.sin(phi),
                     np.cos(phi)], axis=-1)


def accessible_surface_fraction(pos: np.ndarray, radii: np.ndarray,
                                idx: int, probe: float = 1.4,
                                n_points: int = 252) -> float:
    """Fraction of atom `idx`'s solvent-expanded sphere not buried by
    neighbours (the reference's calAccSurf 'accessible' ratio)."""
    center = pos[idx]
    r = radii[idx] + probe
    pts = center + r * fibonacci_sphere(n_points)          # [P, 3]
    other = np.delete(np.arange(len(pos)), idx)
    if len(other) == 0:
        return 1.0
    d = np.linalg.norm(pts[:, None, :] - pos[None, other, :], axis=-1)
    buried = (d < (radii[other] + probe)[None, :]).any(axis=1)
    return float((~buried).mean())


def atom_radii(elements) -> np.ndarray:
    return np.asarray([VDW_RADII.get(int(z), 1.7) for z in elements],
                      np.float32)


def lipo_contributions(mol) -> np.ndarray:
    """Per-atom lipophilicity scores (RDKit-gated).

    Rules (AncPhore-flavored): sp3/aromatic carbons with no polar neighbour
    and halogens on carbon contribute their exposed-surface-scaled weight;
    atoms bonded to N/O/charged centres contribute 0.
    """
    from rdkit import Chem
    mol = Chem.RemoveHs(mol)
    n = mol.GetNumAtoms()
    pos = np.asarray(mol.GetConformer().GetPositions(), np.float32)
    elements = [a.GetAtomicNum() for a in mol.GetAtoms()]
    radii = atom_radii(elements)
    out = np.zeros(n, np.float32)
    for atom in mol.GetAtoms():
        i = atom.GetIdx()
        z = atom.GetAtomicNum()
        lipophilic = (z == 6) or (z in (9, 17, 35, 53))
        if not lipophilic or atom.GetFormalCharge() != 0:
            continue
        polar_nbr = any(nb.GetAtomicNum() in (7, 8, 15, 16) or
                        nb.GetFormalCharge() != 0
                        for nb in atom.GetNeighbors())
        if polar_nbr:
            continue
        surf = accessible_surface_fraction(pos, radii, i)
        # weight ~ exposed surface area contribution (25 A^2 scale keeps
        # a fully exposed CH3 near the reference's per-atom magnitudes)
        out[i] = surf * 4.0
    return out


def hydrophobic_groups(mol, threshold: float = LIPO_THRESHOLD
                       ) -> List[np.ndarray]:
    """Centroids of hydrophobic groups (HY feature points): small rings and
    methyl-like centers whose lipo sum exceeds `threshold`
    (reference `hy_check(follow_ancphore=True)` semantics)."""
    from rdkit import Chem
    mol = Chem.RemoveHs(mol)
    pos = np.asarray(mol.GetConformer().GetPositions(), np.float32)
    lipo = lipo_contributions(mol)
    centers: List[np.ndarray] = []
    used = set()

    for ring in Chem.GetSSSR(mol):
        ring = list(ring)
        if len(ring) < 7 and lipo[ring].sum() > threshold:
            centers.append(pos[ring].mean(axis=0))
            used.update(ring)

    for atom in mol.GetAtoms():
        i = atom.GetIdx()
        if i in used or atom.GetTotalNumHs() <= 2:
            continue
        group = [i]
        s = lipo[i]
        for nb in atom.GetNeighbors():
            if nb.GetTotalNumHs() >= 1:
                group.append(nb.GetIdx())
                s += lipo[nb.GetIdx()]
        if s > threshold:
            centers.append(pos[group].mean(axis=0))
            used.update(group)
    return centers
