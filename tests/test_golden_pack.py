"""The committed golden parity pack regenerates bit-for-bit.

Guards numeric drift in the forward/posterior stack: any change that moves
these values must consciously regenerate the pack (and flag that the
torch-side replay contract changed). See tests/fixtures/golden/README.md.
"""
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures", "golden",
                      "golden_pack.npz")


@pytest.mark.slow
def test_golden_pack_regenerates_identically():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "make_golden", os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "make_golden.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fresh = mod.build_pack()
    stored = np.load(GOLDEN)
    assert set(fresh) == set(stored.files)
    for k in fresh:
        np.testing.assert_array_equal(
            np.asarray(fresh[k]), stored[k],
            err_msg=f"golden drift in {k}; regenerate consciously with "
                    "scripts/make_golden.py")


def test_golden_pack_contents():
    stored = np.load(GOLDEN)
    groups = {"ref_state", "in", "out", "post"}
    seen = {k.split("/")[0] for k in stored.files if "/" in k}
    assert groups <= seen
    assert "config_json" in stored.files
    # count interval present and usable
    lo = stored["out/count_lower"]
    up = stored["out/count_upper"]
    assert lo.shape == up.shape
