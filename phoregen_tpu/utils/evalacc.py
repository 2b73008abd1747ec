"""Discriminative per-element eval accuracies for quality artifacts.

VERDICT r4 item 7: QUALITY/KNN_ACCEPT rows carry only sampling-side
acceptance; per-element accuracies give quality tracking a trainable proxy
beside sanitize-rate. Reference analogue: the train-time accuracies in
`/root/reference/models/common.py:284-297` (ours extends them with
per-element means, models/phoregen.py::element_accuracy).
"""
from __future__ import annotations

from typing import Dict


ACC_KEYS = ("loss", "node_acc", "node_elem_acc", "edge_acc",
            "edge_elem_acc", "count_hit")


def eval_accuracies(pg, cfg, params, seed: int = 9999, n_batches: int = 4,
                    batch_size: int = 16) -> Dict[str, float]:
    """Mean eval-mode metrics of `params` over held-out mixed-corpus
    batches (fresh seed stream, disjoint from every train_real stream,
    which uses seeds around args.seed±2 and +1000+chunk)."""
    import numpy as np

    from ..data.loader import PhoreDataLoader
    from ..data.realcorpus import mixed_corpus
    from ..train.step import make_eval_step

    eval_fn = make_eval_step(pg, cfg)
    data = mixed_corpus(seed, n_batches * batch_size)
    loader = PhoreDataLoader(data, cfg, batch_size, shuffle=False)
    tot: Dict[str, float] = {}
    n = 0
    for vb, real in loader.iter_with_sizes():
        gmask = np.arange(loader.batch_size) < real
        m = eval_fn(params, np.uint32(seed), vb, gmask)
        for k in ACC_KEYS:
            if k in m:
                tot[k] = tot.get(k, 0.0) + float(m[k]) * real
        n += real
    return {k: round(v / max(n, 1), 4) for k, v in tot.items()}
