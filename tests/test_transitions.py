"""Gaussian + categorical transition tests: DDPM identities, row-stochastic
q_mats, posterior identities on hand-computable small-K cases."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phoregen_tpu.ops.schedules import get_beta_schedule
from phoregen_tpu.diffusion import (CategoricalTransition, GaussianTransition,
                                    build_transition_mats)

BETAS = get_beta_schedule("advance", 100, scale_start=0.9999,
                          scale_end=0.0001, width=3)


class TestGaussian:
    def test_coefficient_identities(self):
        tr = GaussianTransition.create(BETAS)
        ab = np.cumprod(1 - BETAS)
        np.testing.assert_allclose(tr.alphas_bar, ab, rtol=1e-6)
        # DDPM identity: with x0 = c and xt = sqrt(abar_t) * c (noiseless
        # forward), the posterior mean is sqrt(abar_{t-1}) * c.
        for t in (1, 50, 99):
            mu = float(tr.coef_x0[t] + tr.coef_xt[t] * np.sqrt(ab[t]))
            assert abs(mu - np.sqrt(ab[t - 1])) < 1e-5, t

    def test_add_noise_statistics(self):
        tr = GaussianTransition.create(BETAS)
        key = jax.random.PRNGKey(0)
        x0 = jnp.zeros((64, 16, 3))
        t = jnp.full((64,), 99, dtype=jnp.int32)
        xt = tr.add_noise(key, x0, t)
        # at T-1 alpha_bar ~ 1e-4 -> x_t ~ N(0, 1)
        assert abs(float(jnp.std(xt)) - 1.0) < 0.05

    def test_t0_returns_mean(self):
        tr = GaussianTransition.create(BETAS)
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        x_t = jax.random.normal(k1, (2, 5, 3))
        x_recon = jax.random.normal(k2, (2, 5, 3))
        t = jnp.zeros((2,), dtype=jnp.int32)
        out1 = tr.get_prev_from_recon(jax.random.PRNGKey(2), x_t, x_recon, t)
        out2 = tr.get_prev_from_recon(jax.random.PRNGKey(3), x_t, x_recon, t)
        np.testing.assert_allclose(out1, out2, rtol=1e-6)  # deterministic at t=0
        mu = tr.coef_x0[0] * x_recon + tr.coef_xt[0] * x_t
        np.testing.assert_allclose(out1, mu, rtol=1e-5)

    def test_energy_grad_shifts_mean(self):
        tr = GaussianTransition.create(BETAS)
        x_t = jnp.ones((1, 3, 3))
        x_recon = jnp.ones((1, 3, 3))
        t = jnp.zeros((1,), dtype=jnp.int32)
        g = jnp.full((1, 3, 3), 0.25)
        out = tr.get_prev_from_recon(jax.random.PRNGKey(0), x_t, x_recon, t,
                                     energy_grad=g)
        base = tr.get_prev_from_recon(jax.random.PRNGKey(0), x_t, x_recon, t)
        np.testing.assert_allclose(base - out, g, rtol=1e-5)


class TestCategorical:
    @pytest.mark.parametrize("init_prob", ["uniform", "absorb", "tomask"])
    def test_q_mats_row_stochastic(self, init_prob):
        prob, q_mats, tq = build_transition_mats(BETAS, 6, init_prob)
        np.testing.assert_allclose(q_mats.sum(-1), 1.0, atol=1e-10)
        assert np.all(q_mats >= 0)
        # terminal distribution approaches the prior
        terminal = q_mats[-1]
        for row in terminal:
            np.testing.assert_allclose(row, prob, atol=2e-3)

    def test_posterior_t0_override(self):
        tr = CategoricalTransition.create(BETAS, 6, "absorb")
        v0 = jnp.array([[1, 2, 3]])
        log_v0 = jax.nn.one_hot(v0, 6)
        log_v0 = jnp.log(jnp.clip(log_v0, 1e-30, None))
        t = jnp.zeros((1,), dtype=jnp.int32)
        post = tr.q_v_posterior(log_v0, log_v0, t)
        np.testing.assert_allclose(post, log_v0, rtol=1e-6)

    def test_posterior_matches_bayes_small_case(self):
        """Hand-computed Bayes check: posterior ∝ Q_t[:, vt] * Qbar_{t-1}[v0, :]."""
        K = 4
        betas = np.array([0.1, 0.2, 0.3])
        tr = CategoricalTransition.create(betas, K, "uniform")
        prob, q_mats, _ = build_transition_mats(betas, K, "uniform")
        one_step = np.transpose(np.asarray(tr.transpose_q_onestep), (0, 2, 1))

        v0, vt, t = 1, 2, 2
        # exact posterior
        num = one_step[t][:, vt] * q_mats[t - 1][v0, :]
        expected = num / num.sum()

        log_v0 = jnp.log(jnp.clip(jax.nn.one_hot(jnp.array([[v0]]), K), 1e-30, None))
        log_vt = jnp.log(jnp.clip(jax.nn.one_hot(jnp.array([[vt]]), K), 1e-30, None))
        post = tr.q_v_posterior(log_v0, log_vt, jnp.array([t]))
        np.testing.assert_allclose(np.exp(post[0, 0]), expected, atol=1e-5)

    def test_add_noise_terminal_is_prior(self):
        tr = CategoricalTransition.create(BETAS, 12, "tomask")
        v = jnp.zeros((8, 64), dtype=jnp.int32)  # all class 0
        t = jnp.full((8,), 99, dtype=jnp.int32)
        onehot, log_vt, log_v0 = tr.add_noise(jax.random.PRNGKey(0), v, t)
        frac_mask = float(jnp.mean(onehot[..., -1]))
        assert frac_mask > 0.95  # absorbed into mask class at T

    def test_compute_v_Lt_modes(self):
        tr = CategoricalTransition.create(BETAS, 6, "absorb")
        logp = jax.nn.log_softmax(jax.random.normal(jax.random.PRNGKey(0), (2, 3, 6)))
        logq = jax.nn.log_softmax(jax.random.normal(jax.random.PRNGKey(1), (2, 3, 6)))
        log_v0 = jnp.log(jnp.clip(jax.nn.one_hot(jnp.array([[0, 1, 2], [3, 4, 5]]), 6), 1e-30, None))
        t = jnp.array([0, 50])
        loss = tr.compute_v_Lt(logp, logq, log_v0, t)
        # graph 0 at t=0: decoder NLL = -logq[v0]
        nll = -jnp.take_along_axis(logq[0], jnp.array([[0], [1], [2]]), axis=-1)[:, 0]
        np.testing.assert_allclose(loss[0], nll, rtol=1e-5)
        # graph 1: KL
        kl = jnp.sum(jnp.exp(logp[1]) * (logp[1] - logq[1]), -1)
        np.testing.assert_allclose(loss[1], kl, rtol=1e-5)

    def test_sample_init_distribution(self):
        tr = CategoricalTransition.create(BETAS, 6, "absorb")
        types, onehot, log_vt = tr.sample_init(jax.random.PRNGKey(0), (4, 512))
        frac0 = float(jnp.mean((types == 0).astype(jnp.float32)))
        assert abs(frac0 - 1.0 / 1.05) < 0.05  # absorb prior: p0 = 1/1.05


# ----- legacy uniform transition (reference models/transition.py:72-175) ----

def test_uniform_transition_matches_matrix_form():
    """The closed-form uniform transition must agree with the matrix-based
    GeneralCategoricalTransition under a uniform prior."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from phoregen_tpu.diffusion import (CategoricalTransition,
                                        UniformCategoricalTransition)
    from phoregen_tpu.ops.schedules import get_beta_schedule

    K, T = 5, 12
    betas = get_beta_schedule("linear", T, beta_start=1e-3, beta_end=0.3)
    mat = CategoricalTransition.create(betas, K, "uniform")
    uni = UniformCategoricalTransition.create(betas, K)

    v = jnp.asarray([[0, 1, 2, 3], [4, 0, 1, 2]])
    log_v0 = jax.nn.one_hot(v, K)
    log_v0 = jnp.log(jnp.clip(log_v0, 1e-30, None))
    for tv in (0, 3, T - 1):
        t = jnp.full((2,), tv, jnp.int32)
        q_mat = np.asarray(jnp.exp(mat.q_vt_pred(log_v0, t)))
        q_uni = np.asarray(jnp.exp(uni.q_vt_pred(log_v0, t)))
        np.testing.assert_allclose(q_mat, q_uni, atol=2e-3)

    # posterior agreement (v0_prob form)
    key = jax.random.PRNGKey(0)
    _, log_vt, _ = uni.add_noise(key, v, jnp.full((2,), 5, jnp.int32))
    t = jnp.full((2,), 5, jnp.int32)
    p_uni = np.asarray(jnp.exp(uni.q_v_posterior(log_v0, log_vt, t)))
    p_mat = np.asarray(jnp.exp(mat.q_v_posterior(log_v0, log_vt, t)))
    np.testing.assert_allclose(p_uni, p_mat, atol=2e-3)


def test_strided_tables_full_T_match_one_step():
    """At stride 1 the strided tables equal the reference 1-step tables."""
    import jax.numpy as jnp
    import numpy as np
    from phoregen_tpu.diffusion import CategoricalTransition
    from phoregen_tpu.diffusion.categorical import build_strided_tables
    from phoregen_tpu.diffusion.gaussian import (GaussianTransition,
                                                 build_gaussian_strided)
    from phoregen_tpu.ops.schedules import get_beta_schedule

    K, T = 6, 16
    betas = get_beta_schedule("linear", T, beta_start=1e-3, beta_end=0.2)
    tr = CategoricalTransition.create(betas, K, "absorb")
    ts = np.arange(T - 1, -1, -1)
    trans_T, cum_prev = build_strided_tables(betas, K, "absorb", ts)
    for i, t in enumerate(ts[:-1]):
        np.testing.assert_allclose(np.asarray(trans_T[i]),
                                   np.asarray(tr.transpose_q_onestep[t]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(cum_prev[i]),
                                   np.asarray(tr.q_mats[max(t - 1, 0)]),
                                   atol=1e-6)
    g = GaussianTransition.create(betas)
    cx0, cxt, std = build_gaussian_strided(betas, ts)
    for i, t in enumerate(ts):
        np.testing.assert_allclose(float(cx0[i]), float(g.coef_x0[t]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(cxt[i]), float(g.coef_xt[t]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(std[i]), float(g.std[t]),
                                   rtol=1e-5, atol=1e-7)


def test_strided_tables_compose():
    """Multi-step transition equals the product of one-step transitions."""
    import numpy as np
    from phoregen_tpu.diffusion.categorical import (build_strided_tables,
                                                    build_transition_mats)
    from phoregen_tpu.ops.schedules import get_beta_schedule

    K, T = 5, 12
    betas = get_beta_schedule("linear", T, beta_start=1e-3, beta_end=0.2)
    ts = np.asarray([11, 7, 3, 0])
    trans_T, cum_prev = build_strided_tables(betas, K, "uniform", ts)
    _, q_mats, tq1 = build_transition_mats(np.asarray(betas, np.float64),
                                           K, "uniform")
    one_step = np.transpose(tq1, (0, 2, 1))
    # step 11 -> 7: product of one-steps 8..11
    want = np.eye(K)
    for s in range(8, 12):
        want = want @ one_step[s]
    np.testing.assert_allclose(np.asarray(trans_T[0]), want.T, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cum_prev[0]), q_mats[7], atol=1e-5)


def test_continuous_categorical_space_end_to_end():
    """categorical_space='continuous' (relaxed one-hot Gaussian diffusion,
    reference models/diffusion.py:94,116-135,321-324,463-469): loss and
    sampler both run and produce finite outputs."""
    import jax
    import numpy as np
    from phoregen_tpu.models.phoregen import PhoreGen
    from phoregen_tpu.sample.sampler import Sampler
    from tests.test_models import make_batch
    from tests.test_train import tiny_config

    cfg = tiny_config()
    cfg.model.diff.categorical_space = "continuous"
    pg = PhoreGen(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    params = pg.init_params(jax.random.PRNGKey(0), batch)
    loss, aux = jax.jit(lambda p, k, b: pg.compute_loss(p, k, b))(
        params, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(loss))
    assert "loss_edge" in aux

    sampler = Sampler(pg, sample_steps=4)
    out = jax.jit(lambda p, k, b: sampler.sample(p, k, b))(
        params, jax.random.PRNGKey(2), batch)
    assert np.isfinite(np.asarray(out["pred_node"])).all()
    assert np.isfinite(np.asarray(out["pred_pos"])).all()
    assert np.isfinite(np.asarray(out["final_state"]["h_node"])).all()


def test_strided_tables_single_step_and_shared_construction():
    """S==1 returns empty per-step tables instead of crashing, and the
    strided construction shares the exact matrices with the training
    tables (same one-step/cumulative code path)."""
    import numpy as np
    from phoregen_tpu.diffusion.categorical import (build_strided_tables,
                                                    build_transition_mats)
    betas = np.linspace(1e-4, 5e-2, 16)
    tT, cp = build_strided_tables(betas, 6, "absorb", np.array([0]))
    assert tT.shape == (0, 6, 6) and cp.shape == (0, 6, 6)
    # stride-1 full schedule reproduces the training tables exactly
    ts = np.arange(15, -1, -1)
    tT, cp = build_strided_tables(betas, 6, "absorb", ts)
    _, q_mats, q_onestep_T = build_transition_mats(betas, 6, "absorb")
    np.testing.assert_allclose(np.asarray(tT[0]), q_onestep_T[15], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cp[-1]), q_mats[0], rtol=1e-6)


def test_uniform_transition_v0_prob_false():
    """UniformCategoricalTransition.q_v_posterior(v0_prob=False) hardens
    log_v0 to its argmax one-hot (same switch semantics as the matrix
    transition) instead of silently ignoring the flag."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from phoregen_tpu.diffusion.categorical import \
        UniformCategoricalTransition
    tr = UniformCategoricalTransition.create(
        np.linspace(1e-3, 5e-2, 8), num_classes=4)
    # a soft (non-degenerate) v0 distribution
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    log_vt = jnp.log(jax.nn.one_hot(jnp.asarray([2]), 4) + 1e-30)
    t = jnp.asarray([5])
    soft = tr.q_v_posterior(logits, log_vt, t, v0_prob=True)
    hard = tr.q_v_posterior(logits, log_vt, t, v0_prob=False)
    assert not np.allclose(np.asarray(soft), np.asarray(hard))
    # hardened == posterior of the exact one-hot
    onehot = jnp.log(jax.nn.one_hot(jnp.asarray([0]), 4) + 1e-30)
    ref = tr.q_v_posterior(onehot, log_vt, t, v0_prob=True)
    np.testing.assert_allclose(np.asarray(hard), np.asarray(ref), atol=1e-5)
