"""utils/evalacc.py: per-element eval accuracies for quality artifacts."""
import jax
import numpy as np

from phoregen_tpu.config import default_config
from phoregen_tpu.data.loader import PhoreDataLoader
from phoregen_tpu.data.synthetic import synthetic_dataset
from phoregen_tpu.models.phoregen import PhoreGen
from phoregen_tpu.utils.evalacc import ACC_KEYS, eval_accuracies


def test_eval_accuracies_keys_and_ranges():
    cfg = default_config("zinc_300")
    m = cfg.model
    m.hidden_dim = 16
    m.denoiser.hidden_dim = 16
    m.denoiser.num_layers = 1
    m.denoiser.n_heads = 2
    m.denoiser.knn = 4
    m.denoiser.num_r_gaussian = 4
    m.diff.num_timesteps = 8
    m.diff.time_dim = 2
    cfg.dataset.ligand_buckets = [32, 48]
    cfg.dataset.max_phore = 96
    cfg.finalize()
    pg = PhoreGen(cfg)
    tmpl = synthetic_dataset(0, 4, max_atoms=12)
    params = pg.init_params(jax.random.PRNGKey(0),
                            next(iter(PhoreDataLoader(tmpl, cfg, 4,
                                                      shuffle=False))))
    acc = eval_accuracies(pg, cfg, params, n_batches=1, batch_size=4)
    for k in ACC_KEYS:
        assert k in acc, k
        assert np.isfinite(acc[k]), (k, acc[k])
    for k in ("node_acc", "node_elem_acc", "edge_acc", "edge_elem_acc",
              "count_hit"):
        assert 0.0 <= acc[k] <= 1.0, (k, acc[k])
