"""Optimizer/scheduler parity vs torch: Adam trajectories and
ReduceLROnPlateau decisions on identical inputs.

The reference trains with `torch.optim.Adam` + `ReduceLROnPlateau(min,
factor 0.9, patience 20, min_lr 1e-6)` stepped on validation loss
(reference `utils/training_utils.py:51-83`, `run/run.py:40-41`); our side
is `optax.adam` + the host-side `PlateauScheduler`. Same gradient
sequence / same loss sequence must give the same parameters / LR.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax


def test_adam_trajectory_parity():
    rng = np.random.default_rng(31)
    p0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(25)]
    lr, betas, eps = 1e-3, (0.9, 0.999), 1e-8

    t_param = torch.nn.Parameter(torch.tensor(p0))
    opt = torch.optim.Adam([t_param], lr=lr, betas=betas, eps=eps)
    for g in grads:
        opt.zero_grad()
        t_param.grad = torch.tensor(g)
        opt.step()

    tx = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               t_param.detach().numpy(),
                               rtol=2e-5, atol=2e-6)


def test_plateau_scheduler_parity():
    from phoregen_tpu.train.loop import PlateauScheduler

    factor, patience, min_lr, lr0 = 0.9, 3, 1e-6, 1e-4
    t_param = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([t_param], lr=lr0)
    ref = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=factor, patience=patience, min_lr=min_lr)
    ours = PlateauScheduler(factor=factor, patience=patience,
                            min_lr=min_lr, lr=lr0)

    rng = np.random.default_rng(37)
    # a loss sequence with improvement phases, plateaus, and a long stall
    losses = list(np.concatenate([
        np.linspace(10, 5, 5),              # improving
        np.full(10, 5.5),                   # plateau -> decays
        np.linspace(5.4, 4.0, 4),           # improving again
        np.full(60, 4.2),                   # long stall -> repeated decays
    ]))
    for i, loss in enumerate(losses):
        ref.step(loss)
        our_lr = ours.step(float(loss))
        ref_lr = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(our_lr, ref_lr, rtol=1e-10,
                                   err_msg=f"epoch {i} loss {loss}")
