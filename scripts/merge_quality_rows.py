"""Assemble/merge QUALITY_r{N}.json from per-phore row streams.

`quality_eval.py` prints one JSON row per pharmacophore as it finishes and
appends the same row to `<out>.rows`; the aggregate artifact is only written
at the very end. When a multi-hour run is killed by a wall-time cap, or when
the remaining phores are finished by a follow-up `--skip ...` run, this tool
rebuilds the aggregate from any mix of row files and run logs.

Usage:
    python scripts/merge_quality_rows.py --round 3 \
        --inputs /tmp/quality_r03b.log QUALITY_r03.json.rows \
        [--meta QUALITY_r03.json]      # copy run metadata if it exists
        [--out QUALITY_r03.json]

Later rows win on duplicate phore names (a rerun supersedes a partial row).
Mirrors the aggregate schema of quality_eval.py (reference acceptance
semantics: /root/reference/sample_all.py:127-135).
"""
from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROW_KEYS = {"phore", "attempted", "accepted", "validity_pct"}


def rows_from_file(path):
    """Accepts a JSONL row stream, a run log with rows interleaved, or a
    previously-merged aggregate artifact (rows under `per_phore`)."""
    text = open(path).read()
    try:
        obj = json.loads(text)
        if isinstance(obj, dict) and "per_phore" in obj:
            return [r for r in obj["per_phore"] if ROW_KEYS.issubset(r)]
    except json.JSONDecodeError:
        pass
    rows = []
    for line in text.splitlines():
        line = line.strip()
        if not (line.startswith("{") and line.endswith("}")):
            continue
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ROW_KEYS.issubset(row):
            rows.append(row)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--inputs", nargs="+", required=True,
                    help="row files / run logs, earliest first")
    ap.add_argument("--meta", default="",
                    help="existing aggregate JSON to copy run metadata "
                         "(weights, backend, knn, samples/phore) from")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    by_name = {}
    for path in args.inputs:
        if not os.path.exists(path):
            print(f"[merge] missing input {path} (skipped)")
            continue
        for row in rows_from_file(path):
            by_name[row["phore"]] = row
    per_phore = list(by_name.values())
    if not per_phore:
        raise SystemExit("[merge] no rows found")

    meta = {}
    if args.meta and os.path.exists(args.meta):
        with open(args.meta) as f:
            meta = json.load(f)
    acc = sum(r["accepted"] for r in per_phore)
    att = sum(r["attempted"] for r in per_phore)
    out = {
        "round": args.round,
        "weights": meta.get("weights", "unknown (merged from rows)"),
        "chem_backend": meta.get("chem_backend", "simplemol"),
        "triplet_knn": meta.get("triplet_knn"),
        "num_samples_per_phore": meta.get("num_samples_per_phore"),
        "overall_validity_pct": round(100.0 * acc / max(att, 1), 1),
        "overall_accepted": acc,
        "total_seconds": round(sum(r.get("seconds", 0) for r in per_phore), 1),
        "merged_from": [os.path.basename(p) for p in args.inputs],
        "per_phore": per_phore,
    }
    out_path = args.out or os.path.join(REPO, f"QUALITY_r{args.round:02d}.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[merge] wrote {out_path}: {len(per_phore)} phores, "
          f"overall {out['overall_validity_pct']}%")


if __name__ == "__main__":
    main()
