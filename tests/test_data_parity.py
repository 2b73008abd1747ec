"""Data-layer parity vs the reference's own `.phore` parser/featurizer.

Runs `PhoreData_New.parse_phore_file` (reference
`datasets/get_phore_data.py:12-105`) on the REAL bundled sampling
pharmacophores and compares feature matrices, unit norms, positions, and
the phore-center-of-mass shift against our `parse_phore_file` +
`featurize_phore(norm_mode='new')`.
"""
import glob
import os
import types

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("PHOREGEN_REFERENCE_PATH", "/root/reference")

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REFERENCE, "datasets")):
    pytest.skip(f"reference checkout not found at {REFERENCE}",
                allow_module_level=True)

import pyg_shims

pyg_shims.install(REFERENCE)

PHORES = sorted(glob.glob(os.path.join(REPO, "data", "phores_for_sampling",
                                       "*.phore")))


class _Node(types.SimpleNamespace):
    pass


class _FakeHetero:
    """The HeteroData surface parse_phore_file touches."""

    def __init__(self):
        self._nodes = {}

    def __getitem__(self, key):
        return self._nodes.setdefault(key, _Node())


def _ref_parse(path):
    from datasets.get_phore_data import PhoreData_New

    ds = PhoreData_New.__new__(PhoreData_New)
    ds.data_name = "zinc_300"
    data = ds.parse_phore_file(path, _FakeHetero())
    return data["phore"]


@pytest.mark.parametrize("path", PHORES,
                         ids=[os.path.basename(p) for p in PHORES])
def test_phore_featurization_parity(path):
    from phoregen_tpu.data.phore import featurize_phore, parse_phore_file

    ref = _ref_parse(path)
    phore = parse_phore_file(path)
    feats, pos, norm, center = featurize_phore(phore, "zinc_300",
                                               norm_mode="new")

    np.testing.assert_allclose(np.asarray(ref.x), np.asarray(feats),
                               atol=1e-6, err_msg="features")
    np.testing.assert_allclose(np.asarray(ref.pos), np.asarray(pos),
                               atol=1e-6, err_msg="positions")
    np.testing.assert_allclose(np.asarray(ref.norm), np.asarray(norm),
                               atol=1e-6, err_msg="unit norms")
    np.testing.assert_allclose(np.asarray(ref.center_of_mass),
                               np.asarray(center), atol=1e-5,
                               err_msg="center of mass")
