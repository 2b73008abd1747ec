"""Toolkit-free SDF reader: round-trips, charges, H-removal, check_mol."""
import os

import numpy as np
import pytest

from phoregen_tpu.data.sdf import (SdfParseError, check_mol, parse_molblock,
                                   read_sdf, remove_hydrogens)
from phoregen_tpu.sample.chem import SimpleMol
from phoregen_tpu.sample.writers import sdf_block, write_sdf


def _ethanol_like() -> SimpleMol:
    # C-C-O chain with one double bond for variety
    return SimpleMol(
        elements=[6, 6, 8],
        pos=np.array([[0.0, 0.0, 0.0], [1.5, 0.0, 0.0], [2.2, 1.1, 0.0]]),
        bond_index=np.array([[0, 1, 1, 2], [1, 0, 2, 1]]),
        bond_type=np.array([1, 1, 2, 2]))


def test_roundtrip_writer_reader(tmp_path):
    mol = _ethanol_like()
    path = os.path.join(tmp_path, "m.sdf")
    write_sdf(mol, path, name="m")
    back = read_sdf(path)
    assert len(back) == 1
    b = back[0]
    assert b.elements == mol.elements
    np.testing.assert_allclose(b.pos, mol.pos, atol=1e-4)
    assert b.undirected_bonds() == mol.undirected_bonds()


def test_multi_record_and_aromatic(tmp_path):
    blocks = (sdf_block([6, 6], np.zeros((2, 3)), [(0, 1, 4)], "a")
              + "$$$$\n"
              + sdf_block([7], np.ones((1, 3)), [], "b") + "$$$$\n")
    path = os.path.join(tmp_path, "two.sdf")
    with open(path, "w") as f:
        f.write(blocks)
    mols = read_sdf(path)
    assert len(mols) == 2
    assert mols[0].undirected_bonds() == [(0, 1, 4)]
    assert mols[1].elements == [7] and mols[1].bond_index.shape == (2, 0)


def test_legacy_and_property_charges():
    # legacy code 3 = +1 on atom 0; M CHG overrides everything
    block = "\n".join([
        "ion", "  test", "",
        "  2  1  0  0  0  0  0  0  0  0999 V2000",
        "    0.0000    0.0000    0.0000 N   0  3  0  0  0  0  0  0  0  0  0  0",
        "    1.2000    0.0000    0.0000 O   0  0  0  0  0  0  0  0  0  0  0  0",
        "  1  2  1  0  0  0  0",
        "M  END"])
    m = parse_molblock(block)
    assert m.charges.tolist() == [1, 0]
    block2 = block.replace("M  END", "M  CHG  1   2  -1\nM  END")
    m2 = parse_molblock(block2)
    # M CHG resets the legacy +1 and sets O to -1
    assert m2.charges.tolist() == [0, -1]


def test_hydrogen_parsing_and_removal():
    block = "\n".join([
        "methanol", "  test", "",
        "  3  2  0  0  0  0  0  0  0  0999 V2000",
        "    0.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0",
        "    1.4000    0.0000    0.0000 O   0  0  0  0  0  0  0  0  0  0  0  0",
        "    2.0000    0.8000    0.0000 H   0  0  0  0  0  0  0  0  0  0  0  0",
        "  1  2  1  0  0  0  0",
        "  2  3  1  0  0  0  0",
        "M  END"])
    m = parse_molblock(block)
    assert m.elements == [6, 8, 1]
    heavy = remove_hydrogens(m)
    assert heavy.elements == [6, 8]
    assert heavy.undirected_bonds() == [(0, 1, 1)]
    np.testing.assert_allclose(heavy.pos, m.pos[:2])


def test_check_mol_paths(tmp_path):
    mol = _ethanol_like()
    sdf_path = os.path.join(tmp_path, "m.sdf")
    write_sdf(mol, sdf_path)
    loaded = check_mol(sdf_path, use_rdkit=False)
    assert loaded.elements == mol.elements
    mol_path = os.path.join(tmp_path, "m.mol")
    with open(mol_path, "w") as f:
        f.write(sdf_block(mol.elements, mol.pos, mol.undirected_bonds()))
    loaded2 = check_mol(mol_path, use_rdkit=False)
    assert loaded2.undirected_bonds() == mol.undirected_bonds()
    # passthrough + unsupported
    assert check_mol(mol, use_rdkit=False) is mol
    with pytest.raises(NotImplementedError):
        check_mol(os.path.join(tmp_path, "nope.xyz2"), use_rdkit=False)
    with pytest.raises(NotImplementedError):
        check_mol(12345, use_rdkit=False)


def test_malformed_blocks():
    with pytest.raises(SdfParseError):
        parse_molblock("too\nshort")
    with pytest.raises(SdfParseError):
        parse_molblock("\n".join([
            "x", "", "", "  1  0  0  0  0  0  0  0  0  0999 V3000"]))
