"""nn.scan'd layer stack vs the unrolled per-layer stack: identical math
when the stacked params equal the per-layer params."""
import jax
import jax.numpy as jnp
import numpy as np

from phoregen_tpu.models.phoregen import PhoreGen
from tests.test_models import forward, make_batch
from tests.test_train import tiny_config


def test_scan_layers_matches_unrolled():
    cfg_u = tiny_config()
    cfg_u.model.denoiser.scan_layers = False
    cfg_u.model.denoiser.num_layers = 3
    pg_u = PhoreGen(cfg_u)

    cfg_s = tiny_config()
    cfg_s.model.denoiser.scan_layers = True
    cfg_s.model.denoiser.num_layers = 3
    pg_s = PhoreGen(cfg_s)

    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    params_u = pg_u.init_params(jax.random.PRNGKey(0), batch)

    # build the scanned param tree by stacking the per-layer subtrees
    pu = params_u["params"]
    den = dict(pu["denoiser"])
    layer_trees = [den.pop(f"layer_{i}") for i in range(3)]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *layer_trees)
    den["layers"] = {"layer": stacked}
    params_s = {"params": {**pu, "denoiser": den}}

    out_u = jax.jit(lambda p, b: forward(pg_u, p, b))(params_u, batch)
    out_s = jax.jit(lambda p, b: forward(pg_s, p, b))(params_s, batch)
    for a, b in zip(out_u[:3], out_s[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_scan_layers_default_trains():
    """Default (scan_layers=True) init + loss finite."""
    cfg = tiny_config()
    assert cfg.model.denoiser.scan_layers
    pg = PhoreGen(cfg)
    rng = np.random.default_rng(1)
    batch = make_batch(rng)
    params = pg.init_params(jax.random.PRNGKey(0), batch)
    loss, aux = jax.jit(
        lambda p, k, b: pg.compute_loss(p, k, b))(
        params, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(loss))
    # stacked param shape: leading axis = num_layers
    lp = params["params"]["denoiser"]["layers"]["layer"]
    leaf = jax.tree_util.tree_leaves(lp)[0]
    assert leaf.shape[0] == cfg.model.denoiser.num_layers