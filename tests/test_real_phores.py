"""Real-data parsing evidence: shipped testset pharmacophores.

The reference distributes 685 evaluation pharmacophores across 5 family
archives (`/root/reference/data/*_testset.zip`) plus 10 sampling phores.
One representative per family is checked in under
`tests/fixtures/testsets/` (plain-text data files); when the full reference
mount is present, the sweep test parses and featurizes every archived
phore, which pins the parser/featurizer against the complete real
distribution (type vocabulary incl. CV label splits, both norm
conventions, EX handling).
"""
import glob
import os
import zipfile

import numpy as np
import pytest

from phoregen_tpu.constants import PHORETYPES_13
from phoregen_tpu.data.phore import featurize_phore, parse_phore_text

FIXTURES = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), "fixtures", "testsets", "*.phore")))
REF_DATA = "/root/reference/data"


def _check_one(text, name):
    phore = parse_phore_text(text, name=name)
    n_raw = len(phore.features)
    assert n_raw > 0, name
    feat, pos, norm, center = featurize_phore(phore, data_name="zinc_300",
                                              norm_mode="new")
    n = feat.shape[0]
    assert 0 < n <= n_raw
    # 13-type vocab + alpha + has_norm(2) + is_EX(2) = 18 columns
    assert feat.shape == (n, len(PHORETYPES_13) + 5), name
    assert pos.shape == (n, 3)
    assert np.isfinite(feat).all() and np.isfinite(pos).all(), name
    assert np.isfinite(center).all()
    # norms are unit or zero
    ln = np.linalg.norm(norm, axis=-1)
    assert np.all((ln < 1e-6) | (np.abs(ln - 1) < 1e-4)), name
    # legacy convention also featurizes cleanly
    feat2, _, norm2, _ = featurize_phore(phore, data_name="zinc_300",
                                         norm_mode="legacy")
    assert np.isfinite(norm2).all(), name
    return n


def test_family_fixtures_parse_and_featurize():
    assert len(FIXTURES) == 5  # one per family
    for path in FIXTURES:
        with open(path) as f:
            text = f.read()
        n = _check_one(text, os.path.basename(path))
        assert 1 <= n <= 200


def test_cv_labels_split_in_13_type_vocab():
    # CV-family fixtures carry warhead labels -> CV1..CV4 classes
    path = [p for p in FIXTURES if os.path.basename(p).startswith("CV_")][0]
    with open(path) as f:
        phore = parse_phore_text(f.read(), name="cv")
    assert any(f.type == "CV" for f in phore.features)
    feat, _, _, _ = featurize_phore(phore, data_name="zinc_300")
    cv_cols = [PHORETYPES_13.index(c) for c in ("CV1", "CV2", "CV3", "CV4")]
    assert feat[:, cv_cols].sum() >= 1  # at least one row classified CV1-4


@pytest.mark.skipif(not os.path.isdir(REF_DATA),
                    reason="reference data mount absent")
def test_sweep_all_reference_testset_phores():
    total = 0
    for zpath in sorted(glob.glob(os.path.join(REF_DATA, "*_testset.zip"))):
        zf = zipfile.ZipFile(zpath)
        for n in zf.namelist():
            if not n.endswith(".phore"):
                continue
            _check_one(zf.read(n).decode(), n)
            total += 1
    for p in sorted(glob.glob(os.path.join(
            REF_DATA, "phores_for_sampling", "*.phore"))):
        with open(p) as f:
            _check_one(f.read(), os.path.basename(p))
        total += 1
    assert total >= 600
