"""Execute the RDKit-gated featurization code against the fake toolkit.

VERDICT round-1 weakness 3: ~1200 LoC of gated code had never run in this
image. RDKit cannot be installed here (no network egress; `pip install
rdkit` fails at resolution — see STATUS.md), so these tests drive the
our-side logic through `tests/fake_rdkit.py`, which mirrors the exact RDKit
attribute surface the modules use. Toolkit *semantics* (SMARTS matching,
sanitization) remain stubbed/programmable by design.
"""
import importlib
import sys

import numpy as np
import pytest

import tests.fake_rdkit as fake


@pytest.fixture()
def gated(monkeypatch):
    """Install the fake rdkit and reload the gated modules; restore after."""
    fake.install(monkeypatch)
    import phoregen_tpu.data.mol as mol_mod
    import phoregen_tpu.data.phorefp as fp_mod
    import phoregen_tpu.data.ligphore as lig_mod
    import phoregen_tpu.data.surface as surf_mod
    mods = [mol_mod, fp_mod, lig_mod, surf_mod]
    for m in mods[:3]:
        importlib.reload(m)
    yield mol_mod, fp_mod, lig_mod, surf_mod
    monkeypatch.undo()
    for m in mods[:3]:
        importlib.reload(m)


def test_featurize_mol_runs(gated):
    mol_mod, _, _, _ = gated
    m = fake.benzene_with_tail()
    lig_type, lig_pos, bond_index, bond_attr = mol_mod.featurize_mol(m)
    # vocabulary: C -> class 1, O -> class 3 (B C N O F Si P S Cl Br I)
    assert lig_type.tolist() == [1] * 7 + [3]
    assert lig_pos.shape == (8, 3)
    # 8 undirected bonds -> 16 directed; aromatic ring bonds class 4
    assert bond_index.shape == (2, 16)
    assert sorted(set(bond_attr.tolist())) == [1, 4]
    # directed symmetry: (i, j) present iff (j, i) present
    pairs = set(map(tuple, bond_index.T.tolist()))
    assert all((j, i) in pairs for i, j in pairs)


def test_featurize_mol_rejects_out_of_vocab(gated):
    mol_mod, _, _, _ = gated
    m = fake.benzene_with_tail()
    m._atoms[7]._z = 34  # selenium: not in the 11-element vocabulary
    with pytest.raises(mol_mod.MolParseError):
        mol_mod.featurize_mol(m)
    m2 = fake.FakeMol([fake.FakeAtom(0, 6)], [], pos=None)
    with pytest.raises(mol_mod.MolParseError):
        mol_mod.featurize_mol(m2)  # no conformer


def test_extra_atom_features_columns(gated):
    mol_mod, _, _, _ = gated
    m = fake.benzene_with_tail()
    arr = mol_mod.extra_atom_features(
        m, include_hybrid=True, hybrid_one_hot=True, include_valencies=True,
        include_ring=True, include_aromatic=True)
    # 4 (hybrid one-hot) + valence + ring + aromatic = 7 columns
    assert arr.shape == (8, 7)
    # ring atoms are SP2-aromatic-in-ring; methyl is SP3 non-ring
    assert arr[0].tolist() == [0.0, 1.0, 0.0, 0.0, 4.0, 1.0, 1.0]
    assert arr[6].tolist() == [0.0, 0.0, 1.0, 0.0, 4.0, 0.0, 0.0]
    # scalar hybrid mode: SP2 -> 2, SP3 -> 3
    arr2 = mol_mod.extra_atom_features(m, include_hybrid=True)
    assert arr2[0, 0] == 2.0 and arr2[6, 0] == 3.0


def test_phore_fingerprint_bookkeeping(gated):
    _, fp_mod, _, _ = gated
    m = fake.benzene_with_tail()
    # program one HY SMARTS to match the methyl and one HD to match the OH
    hy_smarts, hy_idxs = fp_mod.PHORE_PATTERNS["HY"][0]
    hd_smarts, hd_idxs = fp_mod.PHORE_PATTERNS["HD"][0]
    m.set_matches(hy_smarts, [(6,) * (max(hy_idxs) + 1)])
    m.set_matches(hd_smarts, [(7,) * (max(hd_idxs) + 1)])
    fp = fp_mod.generate_ligand_phore_feat(m)
    col = {t: i for i, t in enumerate(fp_mod.PHORETYPES_13)}
    assert fp.shape == (8, 13)
    assert fp[6, col["HY"]] == 1.0
    assert fp[7, col["HD"]] == 1.0
    assert fp[:, col["EX"]].sum() == 0.0  # EX never ligand-derived
    assert fp.sum() == 2.0
    # aromatic ring centroid comes out at the ring centre
    centers = fp_mod.aromatic_ring_centers(m)
    assert len(centers) == 1
    np.testing.assert_allclose(centers[0], [0, 0, 0], atol=1e-6)


def test_ligand_to_phore_synthesis(gated):
    _, fp_mod, lig_mod, _ = gated
    m = fake.benzene_with_tail()
    hy_smarts, hy_idxs = fp_mod.PHORE_PATTERNS["HY"][0]
    hd_smarts, hd_idxs = fp_mod.PHORE_PATTERNS["HD"][0]
    m.set_matches(hy_smarts, [(6,) * (max(hy_idxs) + 1)])
    m.set_matches(hd_smarts, [(7,) * (max(hd_idxs) + 1)])
    rng = np.random.default_rng(0)
    phore = lig_mod.ligand_to_phore(m, rng, name="fake")
    types = [f.type for f in phore.features]
    assert "EX" in types              # shell synthesis ran
    assert any(t in ("AR", "HY", "HD") for t in types)
    # HD feature carries a unit norm pointing away from its neighbour
    for f in phore.features:
        if f.type == "HD":
            assert f.has_norm
            assert np.linalg.norm(f.norm) == pytest.approx(1.0, abs=1e-5)
    # EX volumes clash-filtered against ligand atoms
    lig_pos = np.asarray(m.GetConformer().GetPositions())
    for f in phore.features:
        if f.type == "EX":
            d = np.linalg.norm(lig_pos - np.asarray(f.pos), axis=1).min()
            assert d >= 2.0
    # and the result round-trips through the .phore writer/parser
    import tempfile, os
    from phoregen_tpu.data.phore import parse_phore_file, write_phore_file
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "fake.phore")
        write_phore_file(phore, path)
        back = parse_phore_file(path)
    assert len(back.features) == len(phore.features)


def test_surface_lipo_and_hy_groups(gated):
    _, _, _, surf_mod = gated
    m = fake.benzene_with_tail()
    lipo = surf_mod.lipo_contributions(m)
    assert lipo.shape == (8,)
    assert lipo[7] == 0.0            # oxygen: not lipophilic
    assert lipo[3] == 0.0            # ring C bonded to O: polar neighbour
    assert lipo[1] > 0.0             # bare aromatic C contributes
    groups = surf_mod.hydrophobic_groups(m, threshold=0.5)
    assert len(groups) >= 1          # the ring qualifies
    np.testing.assert_allclose(groups[0], [0, 0, 0], atol=0.5)
    # charged carbon contributes nothing
    m._atoms[6]._charge = 1
    lipo2 = surf_mod.lipo_contributions(m)
    assert lipo2[6] == 0.0


def test_ancphore_lipo_label_rules(gated):
    """Full-depth AncPhore pcharge rules (reference
    `generate_phorefp.py:372-443`): aliphatic carbons keep 1.0, N/O centres
    are 0, carbons one bond from an amine are damped below the final
    threshold (-> 0)."""
    _, _, _, surf_mod = gated
    m = fake.benzene_with_tail()  # aromatic ring + C-C-O-H-ish tail
    pq = surf_mod.label_lipo_atoms(m)
    els = [a.GetAtomicNum() for a in m.GetAtoms()]
    for i, z in enumerate(els):
        if z == 8 or z == 7:
            assert pq[i] == 0.0
    # at least one pure carbon retains full lipophilicity
    assert any(pq[i] == 1.0 for i, z in enumerate(els) if z == 6)
    # no value survives below the 0.25 cutoff (except the 0.15 product)
    assert all(v == 0.0 or v >= 0.25 - 1e-6 or abs(v - 0.15) < 1e-6
               for v in pq)


def test_ancphore_hy_groups_on_cyclohexane(gated):
    """A bare carbocycle's summed exposed-surface lipophilicity exceeds the
    9.87 threshold -> one HY centroid at the ring centre."""
    _, _, _, surf_mod = gated
    import numpy as np
    n = 6
    ang = np.arange(n) * np.pi / 3
    r = 1.54 / (2 * np.sin(np.pi / n))
    pos = np.stack([r * np.cos(ang), r * np.sin(ang), np.zeros(n)], -1)
    atoms = [fake.FakeAtom(i, 6, in_ring=True, num_hs=2) for i in range(n)]
    bonds = [fake.FakeBond(i, (i + 1) % n, fake.BondType.SINGLE)
             for i in range(n)]
    m = fake.FakeMol(atoms, bonds, pos=pos, rings=[tuple(range(n))])
    centers = surf_mod.ancphore_hy_groups(m)
    assert len(centers) == 1
    assert np.linalg.norm(centers[0] - pos.mean(0)) < 1e-5
