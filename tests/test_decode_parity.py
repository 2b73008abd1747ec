"""Decode-stage parity vs the reference's own `decode_data`.

Random logits (with forced mask-class atoms to exercise the bond-reindex
path) decoded by the reference (`utils/sample_utils.py:96-132`) and by our
padded `decode_batch` must produce identical molecules: elements,
positions, and the directed bond set after mask-atom dropping.
"""
import os

import numpy as np
import pytest

REFERENCE = os.environ.get("PHOREGEN_REFERENCE_PATH", "/root/reference")

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REFERENCE, "utils")):
    pytest.skip(f"reference checkout not found at {REFERENCE}",
                allow_module_level=True)

import pyg_shims

pyg_shims.install(REFERENCE)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_decode_parity(seed):
    from utils.sample_utils import decode_data

    from phoregen_tpu.sample.decode import decode_batch

    rng = np.random.default_rng(seed)
    B, NL, Ka, Kb = 2, 9, 12, 6
    lig_mask = np.zeros((B, NL), bool)
    lig_mask[0, :6] = True
    lig_mask[1, :NL] = True
    pred_node = rng.normal(size=(B, NL, Ka)).astype(np.float32)
    # force at least one mask-class atom per graph (class 11 == mask)
    pred_node[0, 1, :] = -5.0
    pred_node[0, 1, 11] = 5.0
    pred_node[1, 4, :] = -5.0
    pred_node[1, 4, 11] = 5.0
    pred_pos = rng.normal(size=(B, NL, 3)).astype(np.float32)
    pred_edge = rng.normal(size=(B, NL, NL, Kb)).astype(np.float32)

    ours = decode_batch(pred_node, pred_pos, pred_edge, lig_mask)

    for g in range(B):
        valid = np.flatnonzero(lig_mask[g])
        n = len(valid)
        # reference edge set: full directed off-diagonal pairs
        ei, erows = [], []
        for a in range(n):
            for b in range(n):
                if a != b:
                    ei.append((a, b))
                    erows.append(pred_edge[g, valid[a], valid[b]])
        ref = decode_data(
            (torch.tensor(pred_node[g, valid]),
             torch.tensor(pred_pos[g, valid]),
             torch.tensor(np.stack(erows))),
            torch.tensor(np.asarray(ei).T))

        assert ref["element"] == list(ours[g]["element"]), f"graph {g}"
        np.testing.assert_allclose(np.asarray(ref["atom_pos"]),
                                   np.asarray(ours[g]["atom_pos"]),
                                   atol=1e-7)
        ref_bonds = {(int(s), int(d), int(t)) for s, d, t in
                     zip(ref["bond_index"][0], ref["bond_index"][1],
                         ref["bond_type"])}
        our_bonds = {(int(s), int(d), int(t)) for s, d, t in
                     zip(ours[g]["bond_index"][0], ours[g]["bond_index"][1],
                         ours[g]["bond_type"])}
        assert ref_bonds == our_bonds, f"graph {g}"
