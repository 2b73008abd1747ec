"""End-to-end numeric parity vs the ACTUAL reference implementation.

Runs scripts/replay_golden_torch.py: the reference PhoreGen's own
`models/{diffusion,uni_denoiser,transition}.py` execute (plain CPU torch +
pure-torch PyG shims from tests/pyg_shims.py) on the golden pack's inputs
and weights; outputs must match this framework's recorded outputs.

Skipped when torch or the reference checkout is unavailable — the replay
script remains the recipe for any torch-enabled environment.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("PHOREGEN_REFERENCE_PATH", "/root/reference")

torch = pytest.importorskip("torch")


@pytest.mark.slow
def test_replay_against_reference(tmp_path):
    if not os.path.isdir(os.path.join(REFERENCE, "models")):
        pytest.skip(f"reference checkout not found at {REFERENCE}")
    out = tmp_path / "parity.json"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "replay_golden_torch.py"),
         "--reference", REFERENCE, "--out", str(out)],
        capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    report = json.loads(out.read_text())
    assert report["all_ok"]
    # the forward path must actually have been compared
    assert report["checks"]["pred_node"]["ok"]
    assert report["checks"]["pred_bond"]["ok"]
