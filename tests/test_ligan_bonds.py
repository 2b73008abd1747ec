"""Toolkit-free liGAN bond-perception pipeline on known geometries.

Parity target: reference `--add_edge openbabel`
(`utils/sample_utils.py:227-380,706-769`) — connect-the-dots, geometric
pruning, bond-order perception, aromatic majority rule, hypervalency
downgrades — reproduced on synthetic atom clouds with known answers.
"""
import numpy as np
import pytest

from phoregen_tpu.sample.ligan_bonds import (connect_the_dots,
                                             downgrade_hypervalent,
                                             mark_aromatic_rings, perceive,
                                             perceive_bond_orders)

C, N, O, F = 6, 7, 8, 9


def hexagon(r=1.39):
    ang = np.arange(6) * np.pi / 3
    return np.stack([r * np.cos(ang), r * np.sin(ang),
                     np.zeros(6)], axis=1)


def test_connect_the_dots_basic():
    # ethane-like heavy skeleton: two carbons at 1.54 A
    pos = np.array([[0.0, 0, 0], [1.54, 0, 0]])
    bonds = connect_the_dots([C, C], pos)
    assert bonds == {(0, 1): 1}


def test_connect_the_dots_rejects_far_and_too_close():
    pos = np.array([[0.0, 0, 0], [2.5, 0, 0], [2.5005, 0, 0]])
    bonds = connect_the_dots([C, C, C], pos)
    # 0-1 and 0-2 too far (2.5 > 2.0 maxbond), 1-2 too close (< 0.01)
    assert (0, 1) not in bonds and (1, 2) not in bonds


def test_halogen_pair_bond_removed():
    # two fluorines 1.4 A apart: both max-1-bond atoms -> bond dropped
    pos = np.array([[0.0, 0, 0], [1.4, 0, 0]])
    assert connect_the_dots([F, F], pos) == {}


def test_stretched_bond_pruned_keeps_connectivity():
    # triangle: two short edges + one long edge (stretch > 0.45);
    # the long edge is removed because the molecule stays connected
    pos = np.array([[0.0, 0, 0], [1.5, 0, 0], [1.306, 1.488, 0]])
    bonds = connect_the_dots([C, C, C], pos)
    d02 = np.linalg.norm(pos[0] - pos[2])
    assert 0.76 * 2 + 0.45 < d02 < 2.0  # premise: 0-2 geometrically poor
    assert (0, 1) in bonds and (1, 2) in bonds
    assert (0, 2) not in bonds


def test_chain_bridge_not_pruned_when_disconnecting():
    # linear chain with one stretched middle bond: removal would
    # disconnect, so it must survive (reference `reachable` guard)
    pos = np.array([[0.0, 0, 0], [1.5, 0, 0], [3.45, 0, 0], [4.95, 0, 0]])
    bonds = connect_the_dots([C, C, C, C], pos)
    assert (1, 2) in bonds


def test_perceive_double_and_triple():
    # ethylene-like C=C at 1.33 A and acetylene-like C#C at 1.20 A;
    # neighbors give sp2/sp context via substituents
    pos2 = np.array([[0.0, 0, 0], [1.33, 0, 0],
                     [-0.77, 1.2, 0], [2.10, 1.2, 0]])  # H-slots as C
    bonds = perceive_bond_orders([C, C, C, C], pos2,
                                 connect_the_dots([C, C, C, C], pos2))
    assert bonds[(0, 1)] == 2

    pos3 = np.array([[0.0, 0, 0], [1.20, 0, 0],
                     [-1.45, 0, 0], [2.65, 0, 0]])  # linear substituents
    bonds3 = perceive_bond_orders([C, C, C, C], pos3,
                                  connect_the_dots([C, C, C, C], pos3))
    assert bonds3[(0, 1)] == 3


def test_single_stays_single():
    pos = np.array([[0.0, 0, 0], [1.54, 0, 0]])
    bonds = perceive_bond_orders([C, C], pos, {(0, 1): 1})
    assert bonds[(0, 1)] == 1


def test_benzene_all_aromatic():
    pos = hexagon()
    bond_index, bond_type = perceive([C] * 6, pos)
    und = {(int(i), int(j)): int(t) for (i, j), t in
           zip(bond_index.T, bond_type) if i < j}
    assert len(und) == 6
    assert all(t == 4 for t in und.values()), und


def test_pyridine_ring_aromatic():
    # one N in the benzene frame: majority rule marks the whole ring
    pos = hexagon()
    bond_index, bond_type = perceive([N, C, C, C, C, C], pos)
    und = {(int(i), int(j)): int(t) for (i, j), t in
           zip(bond_index.T, bond_type) if i < j}
    assert len(und) == 6
    assert all(t == 4 for t in und.values()), und


def test_cyclohexane_not_aromatic():
    # chair-like ring at single-bond lengths: no aromatic marking
    r = 1.54 / (2 * np.sin(np.pi / 6))
    ang = np.arange(6) * np.pi / 3
    z = np.array([0.25, -0.25] * 3)
    pos = np.stack([r * np.cos(ang), r * np.sin(ang), z], axis=1)
    bond_index, bond_type = perceive([C] * 6, pos)
    assert (bond_type == 1).all()


def test_downgrade_hypervalent():
    # central carbon with two "double" bonds + two singles = valence 6:
    # the longest double must be downgraded until valence <= 4
    pos = np.array([[0.0, 0, 0], [1.30, 0, 0], [-1.33, 0, 0],
                    [0, 1.5, 0], [0, -1.5, 0]])
    bonds = {(0, 1): 2, (0, 2): 2, (0, 3): 1, (0, 4): 1}
    out = downgrade_hypervalent([C, C, C, C, C], pos, bonds)
    orders = sorted(out.values())
    assert sum(orders) <= 6 and out[(0, 2)] == 1  # longest double dropped


def test_reconstruct_openbabel_mode_hermetic():
    """End-to-end mode-'openbabel' reconstruction without RDKit/OB: benzene
    cloud -> SimpleMol with 6 aromatic bonds, sanitizes, connected."""
    from phoregen_tpu.sample.chem import HAVE_RDKIT
    from phoregen_tpu.sample.reconstruct import (
        mol_is_connected, reconstruct_from_generated_with_edges)
    if HAVE_RDKIT:
        pytest.skip("exercises the toolkit-free path")
    mol = reconstruct_from_generated_with_edges(
        {"element": [C] * 6, "atom_pos": hexagon(), "bond_index": None,
         "bond_type": None}, add_edge="openbabel")
    assert mol_is_connected(mol)
    assert sum(1 for *_ij, t in mol.undirected_bonds() if t == 4) == 6
