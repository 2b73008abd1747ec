"""`.phore` parse+write round-trip parity vs the reference's own
`parse_phore` / `write_phore_to_file` (utils/phore_utils.py:659-732).

Each bundled real pharmacophore is parsed and re-written by BOTH stacks;
the emitted text must be identical line-for-line (the reference formats
floats with %.3f and keeps EX rows after the typed features — our writer
must reproduce exactly that layout for AncPhore interop).
"""
import glob
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("PHOREGEN_REFERENCE_PATH", "/root/reference")

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REFERENCE, "utils")):
    pytest.skip(f"reference checkout not found at {REFERENCE}",
                allow_module_level=True)

import pyg_shims

pyg_shims.install(REFERENCE)

PHORES = sorted(glob.glob(os.path.join(REPO, "data", "phores_for_sampling",
                                       "*.phore")))[:4]


def _import_phore_utils():
    # phore_utils imports rdkit at module level — import it inside a fresh
    # toolkit-fake window
    import importlib
    import sys
    had = "utils.phore_utils" in sys.modules
    if not had:
        pyg = pyg_shims
        # reuse install()'s machinery by re-entering with the module added
        saved = pyg._REFERENCE_PRELOAD
        pyg._REFERENCE_PRELOAD = ("utils.phore_utils",)
        try:
            pyg.install(REFERENCE)
        finally:
            pyg._REFERENCE_PRELOAD = saved
    return importlib.import_module("utils.phore_utils")


@pytest.mark.parametrize("path", PHORES,
                         ids=[os.path.basename(p) for p in PHORES])
def test_write_roundtrip_parity(path, tmp_path):
    pu = _import_phore_utils()

    from phoregen_tpu.data.phore import parse_phore_file, write_phore_file

    ref_phores = pu.parse_phore(path)
    assert len(ref_phores) == 1
    ref_out = str(tmp_path / "ref.phore")
    pu.write_phore_to_file(ref_phores[0], ref_out, overwrite=True)

    ours = parse_phore_file(path)
    our_out = str(tmp_path / "ours.phore")
    assert ours.name == ref_phores[0].id
    write_phore_file(ours, our_out)

    ref_lines = open(ref_out).read().splitlines()
    our_lines = open(our_out).read().splitlines()
    assert len(ref_lines) == len(our_lines), (
        f"{len(ref_lines)} vs {len(our_lines)} lines")
    for i, (a, b) in enumerate(zip(ref_lines, our_lines)):
        assert a == b, f"line {i}:\n ref: {a}\n ours: {b}"


def test_xyz_writer_parity(tmp_path):
    """XYZ text format vs the reference's `write_xyz`
    (models/model_utils.py:293-299)."""
    import importlib
    import numpy as np

    mu = importlib.import_module("models.model_utils")
    from phoregen_tpu.sample.writers import write_xyz

    rng = np.random.default_rng(41)
    atomic_numbers = [6, 7, 8, 17]
    coords = rng.normal(scale=4.0, size=(4, 3)).astype(np.float32)
    mu.write_xyz(str(tmp_path), atomic_numbers, coords,
                 sam_idx=0, idx=1, p_idx=2)
    ref_text = open(tmp_path / "phore2_0_1.xyz").read()

    write_xyz(atomic_numbers, coords, str(tmp_path / "ours.xyz"))
    our_text = open(tmp_path / "ours.xyz").read()
    assert ref_text == our_text
