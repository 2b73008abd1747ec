"""Hybrid-cutoff edge-set parity vs the reference's own
`batch_hybrid_edge_connection` (models/common.py:211-258, the
`_connect_edge` 'hybrid' branch with add_p_index=True).

Our static fixed-width neighbour table and the reference's dynamic edge
list must describe the same directed edge set: ligand destinations get all
other ligand atoms plus their k nearest phore points; phore destinations
get their k nearest neighbours among all nodes.
"""
import os

import numpy as np
import pytest

REFERENCE = os.environ.get("PHOREGEN_REFERENCE_PATH", "/root/reference")

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REFERENCE, "models")):
    pytest.skip(f"reference checkout not found at {REFERENCE}",
                allow_module_level=True)

import pyg_shims

pyg_shims.install(REFERENCE)

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


@pytest.mark.parametrize("seed", [0, 1])
def test_hybrid_edge_set_parity(seed):
    from models.common import batch_hybrid_edge_connection

    from phoregen_tpu.ops.knn import hybrid_neighbors

    rng = np.random.default_rng(seed)
    B, NP, NL, k = 2, 6, 7, 4
    N = NP + NL
    mask = np.ones((B, N), bool)
    mask[0, NP + 5:] = False       # one graph with padded ligand slots
    mask[0, NP - 1] = False        # and a padded phore slot
    pos = rng.normal(scale=3.0, size=(B, N, 3)).astype(np.float32)

    nbr_idx, nbr_mask = hybrid_neighbors(jnp.asarray(pos),
                                         jnp.asarray(mask), NP, k)
    nbr_idx, nbr_mask = np.asarray(nbr_idx), np.asarray(nbr_mask)

    for g in range(B):
        pv = np.flatnonzero(mask[g, :NP])
        lv = NP + np.flatnonzero(mask[g, NP:])
        ids = np.concatenate([pv, lv])            # padded idx per flat idx
        x_flat = torch.tensor(pos[g, ids])
        mask_ligand = torch.tensor(
            np.concatenate([np.zeros(len(pv)), np.ones(len(lv))]))
        batch = torch.zeros(len(ids), dtype=torch.long)
        ei = batch_hybrid_edge_connection(x_flat, k=k,
                                          mask_ligand=mask_ligand,
                                          batch=batch, add_p_index=True)
        ref_edges = {(int(ids[s]), int(ids[d])) for s, d in ei.T.tolist()}
        our_edges = set()
        for i in range(N):
            if not mask[g, i]:
                continue
            for slot in range(nbr_idx.shape[-1]):
                if nbr_mask[g, i, slot]:
                    our_edges.add((int(nbr_idx[g, i, slot]), i))
        assert ref_edges == our_edges, (
            f"graph {g}: only-ref {sorted(ref_edges - our_edges)[:5]} "
            f"only-ours {sorted(our_edges - ref_edges)[:5]}")
