"""Sample-CLI argument parity: reference alias flags + index resolution."""
import json
import os

from phoregen_tpu.cli.sample import parse_args, resolve_phore_paths


def test_reference_alias_flags():
    a = parse_args(["--check_point", "ck", "--phore_file_list", "idx.json",
                    "--outdir", "/tmp/o", "--save_traj_prob", "0.25"])
    assert a.ckpt == "ck"
    assert a.phore == ["idx.json"]
    assert a.result_path == "/tmp/o"
    assert a.save_traj_prob == 0.25
    b = parse_args(["--ckpt", "ck", "--phore", "x.phore"])
    assert b.ckpt == "ck" and b.phore == ["x.phore"]


def test_index_resolution_prefers_existing(tmp_path):
    # reference-style CWD-relative entries ("./data/...") resolve against
    # the index file's directory when the CWD-relative path doesn't exist
    d = tmp_path / "data" / "phores"
    d.mkdir(parents=True)
    target = d / "a.phore"
    target.write_text("t\n$$$$\n")
    idx = tmp_path / "data" / "phores" / "file_index.json"
    idx.write_text(json.dumps(["./data/phores/a.phore"]))
    paths = resolve_phore_paths([str(idx)])
    assert len(paths) == 1
    # falls back to basename-next-to-index (flat-extracted archive)
    assert os.path.exists(paths[0]) or paths[0].endswith("a.phore")
    assert os.path.basename(paths[0]) == "a.phore"

    # entries relative to the index dir itself
    idx2 = tmp_path / "data" / "phores" / "i2.json"
    idx2.write_text(json.dumps(["a.phore"]))
    p2 = resolve_phore_paths([str(idx2)])
    assert p2 == [str(target)]

    # dict-valued index
    idx3 = tmp_path / "data" / "phores" / "i3.json"
    idx3.write_text(json.dumps({"a": "a.phore"}))
    assert resolve_phore_paths([str(idx3)]) == [str(target)]

    # directory spec globs *.phore
    assert resolve_phore_paths([str(d)]) == [str(target)]
