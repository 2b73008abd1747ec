"""Merge the frag_attract A/B cells and pick the operating weight.

Reads QUALITY-format cell files (one per weight, same phore set, same
seed/recipe otherwise), writes one merged FRAG_AB artifact with the
side-by-side acceptance table, and prints the adopted weight to stdout
(the baseline 0.0 unless a candidate beats it by the adoption margin).

VERDICT r4 item 3: disconnection is 70-100% of rejections; the energy
(sample/sampler.py::frag_attract_energy) was built in round 4 but never
run on hardware. Adoption rule: overall acceptance (accepted/attempted)
must exceed baseline by >= 20% RELATIVE with at least as many attempts
counted as half the baseline's (guards tiny-n flukes).
"""
from __future__ import annotations

import argparse
import glob
import json
import re
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", default="FRAG_AB_r05_w*.json")
    ap.add_argument("--out", default="FRAG_AB_r05.json")
    args = ap.parse_args()

    table = []
    for path in sorted(glob.glob(args.cells)):
        m = re.search(r"_w([0-9.]+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            cell = json.load(f)
        acc = sum(r["accepted"] for r in cell["per_phore"])
        att = sum(r["attempted"] for r in cell["per_phore"])
        table.append({
            "frag_attract": float(m.group(1)),
            "accepted": acc, "attempted": att,
            "acceptance_pct": round(100.0 * acc / max(att, 1), 1),
            "per_phore": [
                {k: r[k] for k in ("phore", "accepted", "attempted",
                                   "validity_pct", "mean_atoms")}
                for r in cell["per_phore"]],
        })
    table.sort(key=lambda r: r["frag_attract"])
    base = next((r for r in table if r["frag_attract"] == 0.0), None)
    winner = 0.0
    verdict = "baseline (no cell beat it)"
    if base is not None and base["attempted"] > 0:
        for r in table:
            if r["frag_attract"] == 0.0 or r["attempted"] < base[
                    "attempted"] * 0.5:
                continue
            if (r["acceptance_pct"] >= 1.2 * base["acceptance_pct"]
                    and r["acceptance_pct"] > winner_pct(table, winner)):
                winner = r["frag_attract"]
                verdict = (f"adopted w={winner}: "
                           f"{r['acceptance_pct']}% vs baseline "
                           f"{base['acceptance_pct']}% (>=1.2x)")
    out = {"cells": table, "adopted_weight": winner, "verdict": verdict}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"adopted_weight": winner, "verdict": verdict}),
          file=sys.stderr)
    print(winner)


def winner_pct(table, w):
    for r in table:
        if r["frag_attract"] == w:
            return r["acceptance_pct"]
    return -1.0


if __name__ == "__main__":
    main()
