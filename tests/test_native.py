"""Native C++ host kernels vs the pure-Python reference implementations."""
import numpy as np
import pytest

from phoregen_tpu import native
from phoregen_tpu.constants import ATOMIC_NUMBERS
from phoregen_tpu.data.synthetic import random_molecule
from phoregen_tpu.sample import predict_bonds as pb
from phoregen_tpu.sample.chem import SimpleMol, is_connected, sanitize_simple


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def _python_predict(elements, pos):
    bond_index = [[], []]
    bond_type = []
    n = len(elements)
    from phoregen_tpu.constants import ELEMENT_SYMBOLS
    for i in range(n):
        for j in range(i + 1, n):
            s1, s2 = sorted([ELEMENT_SYMBOLS[int(elements[i])],
                             ELEMENT_SYMBOLS[int(elements[j])]])
            order = pb.get_bond_order(
                s1, s2, float(np.linalg.norm(pos[i] - pos[j])))
            if order > 0:
                bond_index[0] += [i, j]
                bond_index[1] += [j, i]
                bond_type += [order, order]
    return bond_index, bond_type


def test_predict_bonds_matches_python():
    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(2, 24))
        types, pos, _, _ = random_molecule(rng, n)
        elements = [ATOMIC_NUMBERS[t] for t in types]
        got = native.predict_bonds_native(elements, pos)
        want = _python_predict(elements, pos)
        assert got is not None
        assert got[0] == want[0], f"trial {trial}"
        assert got[1] == want[1], f"trial {trial}"


def test_check_mol_matches_python():
    rng = np.random.default_rng(1)
    for trial in range(20):
        n = int(rng.integers(2, 20))
        types, pos, bidx, battr = random_molecule(rng, n)
        elements = [ATOMIC_NUMBERS[t] for t in types]
        mol = SimpleMol(elements, pos, bidx, battr)
        bonds = mol.undirected_bonds()
        got = native.check_mol_native(elements, bonds)
        assert got is not None
        assert got[0] == sanitize_simple(mol), f"trial {trial} sanitize"
        assert got[1] == is_connected(mol), f"trial {trial} connect"


def test_check_mol_disconnected_and_invalid():
    # two disconnected carbons -> sanitizable but not connected
    got = native.check_mol_native([6, 6], [])
    assert got == (True, False)
    # carbon with 5 single bonds -> valence fail
    elements = [6, 1 if False else 6, 6, 6, 6, 6]
    bonds = [(0, i, 1) for i in range(1, 6)]
    got = native.check_mol_native(elements, bonds)
    assert got[0] is False
    # dangling aromatic bond -> fail
    got = native.check_mol_native([6, 6], [(0, 1, 4)])
    assert got[0] is False
