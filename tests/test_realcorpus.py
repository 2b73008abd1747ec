"""Real-phore-conditioned corpus (data/realcorpus.py): validity,
connectivity, anchoring, bounds, and dataset-factory wiring.

The corpus exists so the trained model is in-distribution on real `.phore`
inputs (reference acceptance contract `sample_all.py:127-135`); every
sample must sanitize + be connected by construction."""
import numpy as np
import pytest

from phoregen_tpu.constants import ATOMIC_NUMBERS, MAX_ATOMS, MIN_ATOMS
from phoregen_tpu.data.phore import parse_phore_file
from phoregen_tpu.data.realcorpus import (cap_phore, free_sample,
                                          grow_anchored,
                                          list_real_phore_files,
                                          load_real_phores, mixed_corpus,
                                          real_phore_sample)
from phoregen_tpu.sample.chem import (SimpleMol, is_connected,
                                      sanitize_simple)


def _mol(s):
    els = [ATOMIC_NUMBERS[t] for t in s.lig_type]
    return SimpleMol(els, s.lig_pos, s.bond_index, s.bond_attr)


def test_bundled_phores_present():
    files = list_real_phore_files()
    assert len(files) >= 690  # 685 testset + 10 sampling


def test_mixed_corpus_valid_connected_bounded():
    samples = mixed_corpus(7, 64)
    assert len(samples) == 64
    n_real = 0
    for s in samples:
        m = _mol(s)
        assert sanitize_simple(m), s.name
        assert is_connected(m), s.name
        assert MIN_ATOMS <= s.n_atoms <= MAX_ATOMS
        assert len(s.phore_x) <= 96
        n_real += s.name.startswith("real_")
    assert 10 < n_real < 54  # both halves of the mix present


def test_mixed_corpus_deterministic():
    a = mixed_corpus(3, 8)
    b = mixed_corpus(3, 8)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.lig_type, y.lig_type)
        np.testing.assert_allclose(x.lig_pos, y.lig_pos)
        np.testing.assert_allclose(x.phore_x, y.phore_x)


def test_cap_phore_keeps_typed_features():
    phores = load_real_phores()
    big = max(phores, key=lambda p: len(p.features))
    assert len(big.features) > 96
    rng = np.random.default_rng(0)
    capped = cap_phore(big, 96, rng)
    assert len(capped.features) <= 96
    want = [f for f in big.features if f.type != "EX"]
    got = [f for f in capped.features if f.type != "EX"]
    assert len(got) == len(want)


def test_anchored_ligand_occupies_phore():
    """Every typed feature point has a ligand atom nearby (the conditioning
    signal the denoiser must learn), and atoms stay out of EX volumes."""
    rng = np.random.default_rng(11)
    path = [p for p in list_real_phore_files()
            if p.endswith("P03211_merge.phore")][0]
    phore = parse_phore_file(path)
    types, pos, bidx, battr = grow_anchored(rng, phore)
    non_ex = np.array([f.pos for f in phore.features if f.type != "EX"])
    for p in non_ex:
        d = np.linalg.norm(pos - p, axis=1).min()
        assert d < 1.6, f"typed feature at {p} has no nearby atom ({d:.2f})"
    ex = np.array([f.pos for f in phore.features if f.type == "EX"])
    dmat = np.linalg.norm(pos[:, None, :] - ex[None, :, :], axis=-1)
    frac_clash = float((dmat.min(axis=1) < 1.2).mean())
    assert frac_clash < 0.25, f"{frac_clash:.0%} of atoms inside EX volumes"


def test_phore_point_distribution_realistic():
    """Corpus phores must cover the real-data size regime (median real phore
    ~90 points) so the count head sees 44-94-point conditioning in training
    (VERDICT round-2 item 3)."""
    samples = mixed_corpus(5, 48)
    pts = np.array([len(s.phore_x) for s in samples])
    assert pts.max() >= 80
    assert (pts >= 40).mean() > 0.4


def test_dataset_factory_mixed_mode():
    from phoregen_tpu.config import default_config
    from phoregen_tpu.data.dataset import get_dataset
    cfg = default_config("zinc_300")
    cfg.dataset.corpus = "mixed"
    cfg.finalize()
    train, valid, test = get_dataset(cfg, synthetic_size=16)
    assert len(train) == 16 and len(valid) == 8 and len(test) == 8
    for s in train:
        assert sanitize_simple(_mol(s)) and is_connected(_mol(s))


def test_free_sample_has_derived_phore():
    rng = np.random.default_rng(2)
    s = free_sample(rng)
    assert len(s.phore_x) >= 2  # at least one typed + EX shell
    # EX one-hot column is the last type column -> feature dim layout holds
    assert s.phore_x.shape[1] == 18  # 13 types + alpha + has_norm(2) + EX(2)


def test_real_phore_sample_centering():
    rng = np.random.default_rng(4)
    phores = load_real_phores()
    s = real_phore_sample(rng, phores[0])
    # centered frame: phore COM at origin
    np.testing.assert_allclose(s.phore_pos.mean(axis=0), 0.0, atol=1e-4)
