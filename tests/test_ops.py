"""Unit tests for the masked-op and kNN primitives and the host decoder."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phoregen_tpu.ops.knn import knn_neighbors, radius_neighbors
from phoregen_tpu.ops.masked import (masked_mean, masked_softmax,
                                     log_sample_categorical)
from phoregen_tpu.sample.decode import decode_batch


def test_knn_neighbors_masked():
    # 4 points on a line, last one padded
    pos = jnp.asarray([[[0., 0, 0], [1., 0, 0], [3., 0, 0], [99., 0, 0]]])
    mask = jnp.asarray([[True, True, True, False]])
    idx, m = knn_neighbors(pos, mask, k=2)
    idx, m = np.asarray(idx), np.asarray(m)
    # node 0's nearest valid neighbours: 1 then 2; padded node never appears
    assert idx[0, 0, 0] == 1 and idx[0, 0, 1] == 2
    assert m[0, 0].all()
    assert not m[0, 3].any()          # padded node has no valid edges
    assert (idx[0, :3] != 3).all()    # nobody selects the padded node
    # self never selected
    for i in range(3):
        assert (idx[0, i] != i).all()


def test_knn_prefix_property():
    """knn(k=a) must equal the first a columns of knn(k=b) for a <= b —
    build_block_tables builds ONE ligand kNN and slices the dire 3-NN set
    out of the triplet K8 set on the strength of this (lax.top_k sorts
    nearest-first with deterministic tie-breaking)."""
    rng = np.random.default_rng(11)
    pos = jnp.asarray(rng.normal(size=(3, 12, 3)), jnp.float32)
    mask = jnp.asarray(rng.random((3, 12)) > 0.25)
    idx8, m8 = knn_neighbors(pos, mask, 8)
    for a in (1, 3, 5):
        idx_a, m_a = knn_neighbors(pos, mask, a)
        np.testing.assert_array_equal(np.asarray(idx_a),
                                      np.asarray(idx8[..., :a]))
        np.testing.assert_array_equal(np.asarray(m_a),
                                      np.asarray(m8[..., :a]))


def test_radius_neighbors_cutoff():
    pos = jnp.asarray([[[0., 0, 0], [1., 0, 0], [5., 0, 0]]])
    mask = jnp.ones((1, 3), bool)
    idx, m = radius_neighbors(pos, mask, k=2, r=2.0)
    m = np.asarray(m)
    assert m[0, 0, 0] and not m[0, 0, 1]  # node 0: 1 within r, 5 outside


def test_masked_softmax_empty_rows():
    scores = jnp.zeros((2, 3))
    mask = jnp.asarray([[True, True, False], [False, False, False]])
    a = np.asarray(masked_softmax(scores, mask, axis=1))
    np.testing.assert_allclose(a[0], [0.5, 0.5, 0.0], atol=1e-6)
    np.testing.assert_allclose(a[1], 0.0)  # empty segment -> zeros


def test_masked_mean_empty():
    x = jnp.ones((2, 3))
    mask = jnp.asarray([[True, False, True], [False, False, False]])
    m = np.asarray(masked_mean(x, mask, axis=1))
    assert m[0] == pytest.approx(1.0)
    assert m[1] == pytest.approx(0.0)


def test_gumbel_sampling_distribution():
    key = jax.random.PRNGKey(0)
    logits = jnp.log(jnp.asarray([[0.8, 0.15, 0.05]]))
    draws = jax.vmap(lambda k: log_sample_categorical(k, logits))(
        jax.random.split(key, 2000))
    freq = np.bincount(np.asarray(draws).ravel(), minlength=3) / 2000
    np.testing.assert_allclose(freq, [0.8, 0.15, 0.05], atol=0.05)


def test_decode_batch_reindexing():
    """Mask-class atoms are dropped with bond indices remapped
    (reference decode_data, utils/sample_utils.py:96-132)."""
    Ka, Kb, NL = 12, 6, 4
    atom_type = np.asarray([1, 11, 2, 0])  # slot 1 = mask class -> dropped
    node = np.eye(Ka)[atom_type][None]
    pos = np.arange(NL * 3).reshape(1, NL, 3).astype(float)
    etype = np.zeros((NL, NL), int)
    etype[0, 2] = etype[2, 0] = 1     # survives, remaps 2 -> 1
    etype[0, 1] = etype[1, 0] = 2     # touches dropped atom -> removed
    etype[2, 3] = etype[3, 2] = 5     # mask bond class -> removed
    edge = np.eye(Kb)[etype][None]
    lig_mask = np.asarray([[True, True, True, True]])
    out = decode_batch(node, pos, edge, lig_mask)[0]
    assert out["element"] == [6, 7, 5]  # classes 1,2,0 -> C,N,B
    bi = np.asarray(out["bond_index"])
    assert sorted(map(tuple, bi.T)) == [(0, 1), (1, 0)]
    assert list(out["bond_type"]) == [1, 1]


def test_mdn_loss_and_sampling():
    """MDN count utilities (reference `models/model_utils.py:436-466`,
    dormant there): NLL matches a hand-computed single-component case;
    sampling concentrates near the selected component's mean."""
    import jax
    import jax.numpy as jnp
    from phoregen_tpu.ops.mdn import mdn_loss, sample_from_mdn

    # single component, unit sigma: NLL = 0.5*log(2*pi) + 0.5*z^2
    label = jnp.asarray([0.0, 1.0])
    mu = jnp.asarray([[0.0], [0.0]])
    sigma = jnp.ones((2, 1))
    pi = jnp.ones((2, 1))
    expected = 0.5 * np.log(2 * np.pi) + 0.5 * np.mean([0.0, 1.0])
    assert float(mdn_loss(label, mu, sigma, pi)) == pytest.approx(
        float(expected), rel=1e-5)

    # two well-separated components; pi picks the second almost surely
    mu2 = jnp.asarray([[0.0, 10.0]] * 512)
    sigma2 = jnp.full((512, 2), 0.1)
    pi2 = jnp.asarray([[0.001, 0.999]] * 512)
    draws = sample_from_mdn(jax.random.PRNGKey(0), mu2, sigma2, pi2)
    assert float(jnp.mean((draws > 5).astype(jnp.float32))) > 0.98
    # tighter sigma -> draws near 10
    assert abs(float(jnp.mean(jnp.where(draws > 5, draws, 10.0)))) - 10 < 0.2

    # mixture NLL is lower when the label sits on a high-pi component
    good = mdn_loss(jnp.asarray([10.0]), mu2[:1], sigma2[:1], pi2[:1])
    bad = mdn_loss(jnp.asarray([0.0]), mu2[:1], sigma2[:1], pi2[:1])
    assert float(good) < float(bad)


def test_hybrid_neighbors_semantics():
    """Hybrid cutoff (reference `models/uni_denoiser.py:356-358`,
    `models/common.py:211-258`): ligand dst = all other ligand + k nearest
    phore; phore dst = k nearest among all nodes."""
    import numpy as np
    import jax.numpy as jnp
    from phoregen_tpu.ops.knn import hybrid_neighbors

    rng = np.random.default_rng(0)
    B, NP, NL, k = 2, 5, 6, 3
    N = NP + NL
    x = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    mask = np.ones((B, N), bool)
    mask[1, 2] = False       # one padded phore point
    mask[1, NP + 4] = False  # one padded ligand atom
    idx, m = hybrid_neighbors(x, jnp.asarray(mask), NP, k)
    assert idx.shape == (B, N, NL + k)
    idx, m = np.asarray(idx), np.asarray(m)
    for b in range(B):
        for d in range(NP, N):       # ligand destinations
            if not mask[b, d]:
                continue
            srcs = set(idx[b, d][m[b, d]])
            want_ll = {s for s in range(NP, N) if mask[b, s] and s != d}
            assert want_ll <= srcs
            phore_srcs = [s for s in srcs if s < NP]
            assert len(phore_srcs) == min(k, int(mask[b, :NP].sum()))
        for d in range(NP):          # phore destinations
            if not mask[b, d]:
                continue
            assert m[b, d].sum() == min(k, int(mask[b].sum()) - 1)


@pytest.mark.slow
def test_hybrid_cutoff_forward():
    """cutoff_mode='hybrid' drives a full forward/loss (closing the last
    `_connect_edge` branch, VERDICT round-2 item 8)."""
    import jax
    from phoregen_tpu.config import default_config
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.synthetic import synthetic_dataset
    from phoregen_tpu.models.phoregen import PhoreGen

    cfg = default_config("zinc_300")
    mm = cfg.model
    mm.hidden_dim = 16
    mm.denoiser.hidden_dim = 16
    mm.denoiser.num_layers = 1
    mm.denoiser.n_heads = 2
    mm.denoiser.knn = 4
    mm.denoiser.cutoff_mode = "hybrid"
    mm.diff.num_timesteps = 8
    mm.diff.time_dim = 2
    cfg.dataset.ligand_buckets = [16]
    cfg.dataset.max_phore = 16
    cfg.dataset.corpus = "chains"
    cfg.finalize()
    pg = PhoreGen(cfg)
    samples = synthetic_dataset(0, 2, max_atoms=12)
    batch = next(iter(PhoreDataLoader(samples, cfg, 2, shuffle=False)))
    params = pg.init_params(jax.random.PRNGKey(0), batch)
    _, metrics = pg.compute_loss(params, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(metrics["loss"]))
