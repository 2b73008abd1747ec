"""Dense masked k-NN graph construction.

TPU-native replacement for torch_cluster's `knn_graph` (reference
`models/uni_denoiser.py:351-361`): instead of a dynamic edge list, each node
gets a fixed-width row of k neighbour indices plus a validity mask, computed
with `jax.lax.top_k` over the masked pairwise-distance matrix. Static shapes,
recomputable inside `lax.scan`.

Semantics match PyG's `knn_graph(x, k, batch, flow='source_to_target')`:
for each destination node i, its k nearest valid neighbours j (j != i) define
incoming edges j->i; graphs with fewer than k valid candidates yield masked
slots.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

_INF = 1e30


def pairwise_sq_dist(x: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distances. x: [..., N, 3] -> [..., N, N].

    Computed with the direct difference form (exact, no |x|^2 cancellation
    error) — N is small (<= ~200) so the O(N^2 * 3) cost is trivial.
    """
    diff = x[..., :, None, :] - x[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def knn_neighbors(x: jnp.ndarray, mask: jnp.ndarray, k: int,
                  return_d2: bool = False,
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked k-NN over padded point sets.

    Args:
      x: [B, N, 3] positions.
      mask: [B, N] validity (False = padding).
      k: neighbours per node (static).

    Returns:
      nbr_idx: [B, N, K] int32 source-node indices (arbitrary where invalid).
      nbr_mask: [B, N, K] bool; True where the edge nbr_idx[b,i,m] -> i exists.
      (with return_d2: also the masked [B, N, N] squared distances)
    """
    B, N = mask.shape
    k = min(k, N - 1)  # a graph of N nodes has at most N-1 neighbours
    d2 = pairwise_sq_dist(x)  # [B, N, N], axis -1 = candidate source j
    eye = jnp.eye(N, dtype=bool)
    valid_pair = mask[:, None, :] & mask[:, :, None] & ~eye  # [B, dst, src]
    d2 = jnp.where(valid_pair, d2, _INF)
    neg_d2, nbr_idx = lax.top_k(-d2, k)  # nearest k along src axis
    nbr_mask = neg_d2 > -_INF * 0.5
    if return_d2:
        return nbr_idx.astype(jnp.int32), nbr_mask, d2
    return nbr_idx.astype(jnp.int32), nbr_mask


def radius_neighbors(x: jnp.ndarray, mask: jnp.ndarray, k: int, r: float,
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Radius graph capped at k neighbours (dense analogue of `radius_graph`).

    Keeps the k nearest neighbours within radius r; the fixed width keeps
    shapes static while matching radius-graph semantics for typical densities.
    """
    nbr_idx, nbr_mask, d2 = knn_neighbors(x, mask, k, return_d2=True)
    # d2 is masked to +inf on invalid pairs; those are already excluded by
    # nbr_mask, so reusing it avoids a second pairwise pass
    sel = jnp.take_along_axis(d2, nbr_idx, axis=-1)
    return nbr_idx, nbr_mask & (sel <= r * r)


def hybrid_neighbors(x: jnp.ndarray, mask: jnp.ndarray, num_phore: int,
                     k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape hybrid cutoff (reference `_connect_edge` 'hybrid',
    `models/uni_denoiser.py:356-358` + `models/common.py:211-258`):

    - ligand destinations receive ALL other ligand atoms (fully connected)
      plus their k nearest pharmacophore points;
    - pharmacophore destinations receive their k nearest neighbours among
      all nodes (the reference's `add_p_index=True` branch).

    Composed layout [phore(NP); ligand(NL)]; returns a fixed-width
    [B, N, NL + k] neighbour table (ligand rows: NL slots of ligand sources
    with self/padding masked, then k phore slots; phore rows: k slots).
    """
    B, N = mask.shape
    NP = num_phore
    NL = N - NP
    k = min(k, N - 1)
    d2 = pairwise_sq_dist(x)
    eye = jnp.eye(N, dtype=bool)
    valid_pair = mask[:, None, :] & mask[:, :, None] & ~eye  # [B, dst, src]
    d2m = jnp.where(valid_pair, d2, _INF)

    width = NL + k
    # --- ligand rows ---
    lig_src_idx = jnp.broadcast_to(jnp.arange(NP, N)[None, None, :],
                                   (B, NL, NL)).astype(jnp.int32)
    lig_ll_mask = valid_pair[:, NP:, NP:]                    # [B, NL, NL]
    d2_lp = jnp.where(mask[:, None, :NP] & mask[:, NP:, None],
                      d2[:, NP:, :NP], _INF)                 # [B, NL, NP]
    kp = min(k, NP)
    neg, lp_idx = lax.top_k(-d2_lp, kp)                      # phore sources
    lp_mask = neg > -_INF * 0.5
    pad = k - kp
    if pad:
        lp_idx = jnp.concatenate(
            [lp_idx, jnp.zeros((B, NL, pad), lp_idx.dtype)], -1)
        lp_mask = jnp.concatenate(
            [lp_mask, jnp.zeros((B, NL, pad), bool)], -1)
    lig_idx = jnp.concatenate([lig_src_idx, lp_idx.astype(jnp.int32)], -1)
    lig_mask_row = jnp.concatenate([lig_ll_mask, lp_mask], -1)

    # --- phore rows: k nearest among all nodes ---
    negp, p_idx = lax.top_k(-d2m[:, :NP], k)
    p_mask = negp > -_INF * 0.5
    p_idx = jnp.concatenate(
        [p_idx.astype(jnp.int32),
         jnp.zeros((B, NP, width - k), jnp.int32)], -1)
    p_mask = jnp.concatenate(
        [p_mask, jnp.zeros((B, NP, width - k), bool)], -1)

    nbr_idx = jnp.concatenate([p_idx, lig_idx], 1)           # [B, N, width]
    nbr_mask = jnp.concatenate([p_mask, lig_mask_row], 1)
    return nbr_idx, nbr_mask
