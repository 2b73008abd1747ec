"""Data-layer tests: bucketed loader, transforms, phore parser round-trip,
dataset factory."""
import os

import numpy as np
import pytest

from phoregen_tpu.config import default_config
from phoregen_tpu.data.batching import pick_bucket
from phoregen_tpu.data.dataset import get_dataset
from phoregen_tpu.data.loader import PhoreDataLoader
from phoregen_tpu.data.phore import (Phore, PhoreFeature, featurize_phore,
                                     parse_phore_text, write_phore_file)
from phoregen_tpu.data.synthetic import synthetic_dataset
from phoregen_tpu.data.transforms import add_phore_noise


def small_config():
    cfg = default_config("zinc_300")
    cfg.dataset.ligand_buckets = [16, 32]
    cfg.dataset.max_phore = 16
    return cfg


def test_pick_bucket():
    assert pick_bucket(5, [16, 32]) == 16
    assert pick_bucket(16, [16, 32]) == 16
    assert pick_bucket(17, [16, 32]) == 32
    assert pick_bucket(99, [16, 32]) == 32


def test_loader_bucketing_and_masks():
    cfg = small_config()
    samples = synthetic_dataset(0, 24, max_atoms=28)
    loader = PhoreDataLoader(samples, cfg, batch_size=4, shuffle=True,
                             seed=1)
    seen_shapes = set()
    n_batches = 0
    for batch in loader:
        n_batches += 1
        B, NL = batch.lig_type.shape
        assert B == 4
        assert NL in (16, 32)
        seen_shapes.add(NL)
        counts = np.asarray(batch.lig_mask).sum(1)
        assert (counts >= 8).all() and (counts <= 28).all()
        # padded slots carry zeros
        lm = np.asarray(batch.lig_mask)
        assert (np.asarray(batch.lig_type)[~lm] == 0).all()
        # bonds only between real atoms
        bt = np.asarray(batch.bond_type)
        bm = np.asarray(batch.bond_mask)
        assert (bt[~bm] == 0).all()
    assert n_batches == len(loader) > 0


def test_loader_epoch_shuffling_deterministic():
    cfg = small_config()
    samples = synthetic_dataset(3, 16, max_atoms=14)
    loader = PhoreDataLoader(samples, cfg, batch_size=4, shuffle=True, seed=7)
    loader.set_epoch(0)
    a = [np.asarray(b.lig_pos).sum() for b in loader]
    loader.set_epoch(0)
    b = [np.asarray(b.lig_pos).sum() for b in loader]
    assert a == b  # same epoch -> same order (seeded)
    loader.set_epoch(1)
    c = [np.asarray(b.lig_pos).sum() for b in loader]
    assert a != c  # different epoch -> different shuffle/augment


def test_add_phore_noise_preserves_unit_norms():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(6, 3)).astype(np.float32)
    norm = np.zeros((6, 3), np.float32)
    norm[:3] = rng.normal(size=(3, 3))
    norm[:3] /= np.linalg.norm(norm[:3], axis=1, keepdims=True)
    npos, nnorm = add_phore_noise(rng, pos, norm, 0.1, 5.0)
    assert npos.shape == pos.shape
    d = np.linalg.norm(npos - pos, axis=1)
    assert (d < 1.0).all() and (d > 0).any()
    lens = np.linalg.norm(nnorm[:3], axis=1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-5)
    assert (nnorm[3:] == 0).all()  # no-norm points untouched
    # rotation bounded by 5 degrees
    cos = np.sum(nnorm[:3] * norm[:3], axis=1)
    assert (cos > np.cos(np.deg2rad(5.1))).all()


PHORE_TEXT = """test_phore
AR\t1.0\t1\t1\t1.0\t2.0\t3.0\t1\t0.0\t0.0\t1.0\t0\t1
HD\t0.7\t1\t1\t-1.0\t0.5\t2.0\t0\t0.0\t0.0\t0.0\t0\t1
CV\t0.7\t1\t1\t0.0\t0.0\t0.0\t0\t0.0\t0.0\t0.0\t2\t1
CR\t0.7\t1\t1\t9.0\t9.0\t9.0\t0\t0.0\t0.0\t0.0\t0\t1
EX\t0.837\t0.5\t1\t4.0\t4.0\t4.0\t0\t0.0\t0.0\t0.0\t0\t1
$$$$
"""


def test_phore_parse_featurize_roundtrip(tmp_path):
    phore = parse_phore_text(PHORE_TEXT, name="test_phore")
    # CR skipped at featurization; CV split to CV2 by label under 13-type
    feats, pos, norm, center = featurize_phore(phore, "zinc_300")
    assert feats.shape == (4, 18)  # 13 types + alpha + has_norm(2) + ex(2)
    # AR row: one-hot col 2, has_norm col 14 set
    assert feats[0, 2] == 1.0 and feats[0, 15] == 1.0
    # CV label '2' -> CV2 column (index 8)
    assert feats[2, 8] == 1.0
    # EX last type column + is_EX one-hot
    assert feats[3, 12] == 1.0 and feats[3, 17] == 1.0
    np.testing.assert_allclose(np.linalg.norm(norm[0]), 1.0, atol=1e-6)

    # writer round-trip
    path = str(tmp_path / "x.phore")
    write_phore_file(phore, path)
    from phoregen_tpu.data.phore import parse_phore_file
    phore2 = parse_phore_file(path)
    assert len(phore2.features) == len(phore.features)
    f2, p2, n2, c2 = featurize_phore(phore2, "zinc_300")
    np.testing.assert_allclose(f2, feats, atol=1e-5)
    np.testing.assert_allclose(p2, pos, atol=1e-4)


def test_get_dataset_synthetic_fallback():
    cfg = small_config()
    train, valid, test = get_dataset(cfg, synthetic_size=32)
    assert len(train) == 32 and len(valid) >= 3 and len(test) >= 3
    s = train[0]
    assert s.lig_pos.shape == (s.n_atoms, 3)
    assert s.phore_x.shape[1] == 18


def test_masking_transforms():
    from phoregen_tpu.data.transforms import (k_hop_expand,
                                              ligand_phore_affiliation,
                                              mask_by_phore)
    rng = np.random.default_rng(0)
    lig_pos = np.asarray([[0, 0, 0], [1.4, 0, 0], [10, 0, 0]], np.float32)
    phore_pos = np.asarray([[0.5, 0, 0], [20, 0, 0]], np.float32)
    is_ex = np.asarray([False, True])
    fixed = mask_by_phore(rng, lig_pos, phore_pos, is_ex,
                          ligand_threshold=1.5, mask_one_phore=True)
    assert fixed.tolist() == [True, True, False]

    # chain 0-1-2-3: 1 hop from atom 0 reaches {0,1}; 2 hops {0,1,2}
    bond_index = np.asarray([[0, 1, 1, 2, 2, 3], [1, 0, 2, 1, 3, 2]])
    assert k_hop_expand(bond_index, 4, [0], 1).tolist() == [True, True,
                                                            False, False]
    assert k_hop_expand(bond_index, 4, [0], 2).tolist() == [True, True,
                                                            True, False]

    aff = ligand_phore_affiliation(lig_pos, phore_pos, is_ex,
                                   dis_threshold=1.8)
    assert aff.tolist() == [0, -1]  # nearest atom within range; EX skipped


def test_pz_dataset_roundtrip(tmp_path):
    import pickle
    from phoregen_tpu.config import default_config
    from phoregen_tpu.data.dataset import pz_dataset
    from phoregen_tpu.data.synthetic import synthetic_dataset
    cfg = default_config("zinc_300")
    cfg.dataset.max_atom = 20
    samples = synthetic_dataset(0, 8, max_atoms=28)
    path = str(tmp_path / "graphs.pkl")
    with open(path, "wb") as f:
        pickle.dump(samples, f)
    loaded = pz_dataset(path, cfg)
    assert all(s.n_atoms <= 20 for s in loaded)
    assert 0 < len(loaded) < len(samples)  # filter applied


def test_loader_len_with_uneven_buckets():
    """len(loader) must equal the actual per-bucket batch count (review
    finding: mixed bucket sizes not divisible by batch_size)."""
    from phoregen_tpu.data.synthetic import synthetic_raw
    cfg = small_config()
    rng = np.random.default_rng(5)
    samples = ([synthetic_raw(rng, n_atoms=10) for _ in range(15)]
               + [synthetic_raw(rng, n_atoms=28) for _ in range(7)])
    loader = PhoreDataLoader(samples, cfg, batch_size=4, shuffle=True, seed=3)
    assert len(list(loader)) == len(loader)
    loader2 = PhoreDataLoader(samples, cfg, batch_size=4, shuffle=False)
    assert len(list(loader2)) == len(loader2)


def test_legacy_norm_rowwise():
    """Legacy norm mode must treat all-zero rows (no norm) per feature, not
    per component (review finding)."""
    text = ("t\n"
            "HD\t0.7\t1\t1\t1.0\t2.0\t3.0\t1\t0.0\t5.0\t5.0\t0\t1\n"
            "HA\t0.7\t1\t1\t1.0\t1.0\t1.0\t0\t0.0\t0.0\t0.0\t0\t1\n"
            "$$$$\n")
    phore = parse_phore_text(text, name="t")
    _, pos, norm, _ = featurize_phore(phore, "zinc_300", norm_mode="legacy")
    # direction = (0,5,5) - (1,2,3) = (-1,3,2), normalized
    want = np.asarray([-1.0, 3.0, 2.0])
    want = want / np.linalg.norm(want)
    np.testing.assert_allclose(norm[0], want, atol=1e-6)
    np.testing.assert_allclose(norm[1], 0.0)  # all-zero norm stays zero
