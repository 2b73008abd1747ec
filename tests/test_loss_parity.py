"""Training-objective parity vs the reference's own loss functions.

Executes the reference's `qd_loss` (models/common.py:261-281), the
`GeneralCategoricalTransition.compute_v_Lt` KL/decoder-NLL loss
(models/transition.py:317-329), and the LEGACY uniform
`CategoricalTransition` posterior/marginal (models/transition.py:72-175)
on CPU torch (PyG shims) against this framework's implementations on
identical inputs.
"""
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
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


def test_qd_loss_parity():
    from models.common import qd_loss as ref_qd
    from phoregen_tpu.models.phoregen import qd_loss as our_qd

    rng = np.random.default_rng(5)
    for factor in (1.0, 0.5):
        y_true = rng.uniform(0, 1, size=(16, 1)).astype(np.float32)
        y_l = (y_true - rng.uniform(-0.2, 0.4, size=(16, 1))
               ).astype(np.float32)
        y_u = (y_true + rng.uniform(-0.2, 0.4, size=(16, 1))
               ).astype(np.float32)
        ref = ref_qd(torch.tensor(y_true), torch.tensor(y_l),
                     torch.tensor(y_u), s=160, nd=15, factor=factor)
        ours = our_qd(jnp.asarray(y_true), jnp.asarray(y_l),
                      jnp.asarray(y_u), s=160.0, nd=15.0, factor=factor)
        np.testing.assert_allclose(float(ref), float(ours),
                                   rtol=1e-5, atol=1e-6)


def _betas(T=8):
    return np.linspace(1e-3, 0.4, T).astype(np.float64)


def test_compute_v_Lt_parity():
    from models.transition import GeneralCategoricalTransition

    from phoregen_tpu.diffusion.categorical import CategoricalTransition

    K, T, n = 6, 8, 20
    ref_tr = GeneralCategoricalTransition(_betas(T), K, init_prob="absorb")
    our_tr = CategoricalTransition.create(_betas(T), K, init_prob="absorb")

    rng = np.random.default_rng(9)
    logits_true = rng.normal(size=(n, K)).astype(np.float32)
    logits_pred = rng.normal(size=(n, K)).astype(np.float32)
    lpt = logits_true - np.log(np.exp(logits_true).sum(-1, keepdims=True))
    lpp = logits_pred - np.log(np.exp(logits_pred).sum(-1, keepdims=True))
    v0 = rng.integers(0, K, size=n)
    log_v0 = np.full((n, K), -30.0, np.float32)
    log_v0[np.arange(n), v0] = 0.0
    # graph time ids incl. the t==0 decoder-NLL branch
    t_graph = torch.tensor([0, 3])
    batch = torch.tensor([0] * (n // 2) + [1] * (n // 2))
    ref = ref_tr.compute_v_Lt(torch.tensor(lpt), torch.tensor(lpp),
                              torch.tensor(log_v0), t_graph, batch)
    t_elem = np.asarray([0] * (n // 2) + [3] * (n // 2))
    ours = our_tr.compute_v_Lt(jnp.asarray(lpt), jnp.asarray(lpp),
                               jnp.asarray(log_v0), jnp.asarray(t_elem))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(ours),
                               rtol=2e-5, atol=2e-5)


def test_legacy_uniform_transition_parity():
    from models.transition import CategoricalTransition as RefLegacy

    from phoregen_tpu.diffusion.categorical import \
        UniformCategoricalTransition

    K, T, n = 12, 8, 24
    ref_tr = RefLegacy(_betas(T), K)
    our_tr = UniformCategoricalTransition.create(_betas(T), K)

    rng = np.random.default_rng(11)
    logits = rng.normal(size=(n, K)).astype(np.float32)
    log_v0 = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    vt = rng.integers(0, K, size=n)
    log_vt = np.full((n, K), -30.0, np.float32)
    log_vt[np.arange(n), vt] = 0.0

    batch = torch.tensor([0] * (n // 2) + [1] * (n // 2))
    for t_pair in ((0, 5), (1, 7)):
        t_graph = torch.tensor(t_pair)
        t_elem = jnp.asarray([t_pair[0]] * (n // 2)
                             + [t_pair[1]] * (n // 2))
        ref_marg = ref_tr.q_vt_pred(torch.tensor(log_v0), t_graph, batch)
        our_marg = our_tr.q_vt_pred(jnp.asarray(log_v0), t_elem)
        np.testing.assert_allclose(np.asarray(ref_marg),
                                   np.asarray(our_marg),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"q_vt_pred t={t_pair}")
        ref_post = ref_tr.q_v_posterior(torch.tensor(log_v0),
                                        torch.tensor(log_vt), t_graph, batch)
        our_post = our_tr.q_v_posterior(jnp.asarray(log_v0),
                                        jnp.asarray(log_vt), t_elem)
        np.testing.assert_allclose(np.asarray(ref_post),
                                   np.asarray(our_post),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"q_v_posterior t={t_pair}")
