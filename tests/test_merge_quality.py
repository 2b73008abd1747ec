"""Tests for scripts/merge_quality_rows.py (quality-artifact recovery).

The reference-scale quality harness (100 samples/phore over the bundled
sampling set, reference `sample.sh:21-34`) runs for hours; wall-capped runs
recover their per-phore rows from the incremental `.rows` stream / stdout
log and rebuild the aggregate with the merge tool.
"""
import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MERGE = os.path.join(REPO, "scripts", "merge_quality_rows.py")


def _row(name, accepted, attempted, secs=10.0):
    return {"phore": name, "n_points": 5, "count_interval": [4, 20],
            "attempted": attempted, "accepted": accepted,
            "validity_pct": round(100.0 * accepted / attempted, 1),
            "uniqueness_pct": 100.0, "count_interval_hit_pct": 100.0,
            "mean_atoms": 12.0, "seconds": secs, "abandoned": False}


def test_merge_rows_from_log_and_rows(tmp_path):
    # a run log with noise lines interleaved (as stdout logs have)
    log = tmp_path / "run.log"
    log.write_text(
        "WARNING: platform axon is experimental\n"
        + json.dumps(_row("A", 10, 100)) + "\n"
        + "[I] something\n"
        + json.dumps(_row("B", 5, 50)) + "\n")
    # a follow-up .rows file that supersedes B and adds C
    rows = tmp_path / "part2.rows"
    rows.write_text(json.dumps(_row("B", 40, 100)) + "\n"
                    + json.dumps(_row("C", 0, 300)) + "\n")
    meta = tmp_path / "meta.json"
    meta.write_text(json.dumps({"weights": "w", "chem_backend": "simplemol",
                                "triplet_knn": 32,
                                "num_samples_per_phore": 100}))
    out = tmp_path / "QUALITY.json"
    subprocess.run(
        [sys.executable, MERGE, "--round", "3", "--inputs", str(log),
         str(rows), "--meta", str(meta), "--out", str(out)],
        check=True, capture_output=True)
    agg = json.loads(out.read_text())
    by = {r["phore"]: r for r in agg["per_phore"]}
    assert set(by) == {"A", "B", "C"}
    assert by["B"]["accepted"] == 40          # later input wins
    assert agg["overall_accepted"] == 50
    assert agg["overall_validity_pct"] == 10.0  # 50 / 500
    assert agg["triplet_knn"] == 32
    assert agg["weights"] == "w"


def test_merge_requires_rows(tmp_path):
    empty = tmp_path / "empty.log"
    empty.write_text("no rows here\n")
    res = subprocess.run(
        [sys.executable, MERGE, "--round", "3", "--inputs", str(empty)],
        capture_output=True)
    assert res.returncode != 0


def test_merge_accepts_aggregate_input(tmp_path):
    """A previously-merged aggregate artifact can seed a further merge
    (the round-4 continuation flow in scripts/quality_remaining.sh)."""
    agg = tmp_path / "QUALITY_prev.json"
    agg.write_text(json.dumps({
        "round": 3, "per_phore": [_row("A", 10, 100), _row("B", 5, 50)]}))
    rows = tmp_path / "cont.rows"
    rows.write_text(json.dumps(_row("C", 30, 100)) + "\n")
    out = tmp_path / "merged.json"
    subprocess.run(
        [sys.executable, MERGE, "--round", "3", "--inputs", str(agg),
         str(rows), "--out", str(out)], check=True, capture_output=True)
    merged = json.loads(out.read_text())
    assert {r["phore"] for r in merged["per_phore"]} == {"A", "B", "C"}
    assert merged["overall_accepted"] == 45
