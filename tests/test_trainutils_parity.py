"""Training-utility parity vs the reference: adaptive grad-clip queue + EMA.

Feeds an identical gradient-norm trajectory through the reference's
`Queue` + `gradient_clipping` (utils/training_utils.py:163-199, via a
one-parameter module whose gradient norm we control exactly) and through
our jit-resident `GradNormQueue` clip rule; thresholds and post-clip queue
contents must coincide step for step. EMA update compared directly
(models/model_utils.py:21-42).
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

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def test_grad_clip_queue_parity():
    from utils.training_utils import Queue, gradient_clipping

    from phoregen_tpu.train.state import GradNormQueue

    rng = np.random.default_rng(17)
    norms = np.concatenate([
        rng.uniform(100.0, 400.0, size=10),      # warm-up regime
        [5000.0, 8000.0],                        # spikes that must clip
        rng.uniform(50.0, 200.0, size=40),       # long tail > queue window
    ]).astype(np.float64)

    # reference: a single-parameter module whose grad we set directly so
    # clip_grad_norm_ sees exactly `norm`
    mod = torch.nn.Linear(1, 1, bias=False)
    q_ref = Queue(max_len=50)
    q_ref.add(3000.0)                            # reference seed (run.py:28)
    ref_thresholds, ref_norms = [], []
    for norm in norms:
        mod.weight.grad = torch.tensor([[float(norm)]])
        thr = 1.5 * q_ref.mean() + 2 * q_ref.std()
        gradient_clipping(mod, q_ref)
        ref_thresholds.append(thr)

    ours = GradNormQueue.create()
    our_thresholds = []
    for norm in norms:
        mean, std = ours.stats()
        thr = 1.5 * float(mean) + 2.0 * float(std)
        our_thresholds.append(thr)
        pushed = min(float(norm), thr)
        ours = ours.push(jnp.asarray(pushed, jnp.float32))

    np.testing.assert_allclose(np.asarray(our_thresholds),
                               np.asarray(ref_thresholds),
                               rtol=1e-5)
    # final queue contents match as multisets
    np.testing.assert_allclose(
        sorted(np.asarray(ours.values)[:int(ours.count)]),
        sorted(q_ref.items), rtol=1e-5)


def test_ema_parity():
    from models.model_utils import EMA

    from phoregen_tpu.train.state import ema_update

    rng = np.random.default_rng(23)
    p0 = rng.normal(size=(4, 3)).astype(np.float32)
    mod = torch.nn.Linear(3, 4, bias=False)
    with torch.no_grad():
        mod.weight.copy_(torch.tensor(p0))
    ema = EMA(0.9, list(mod.parameters()))
    shadow = {"w": jnp.asarray(p0)}
    for step in range(5):
        upd = rng.normal(size=(4, 3)).astype(np.float32)
        with torch.no_grad():
            mod.weight.copy_(torch.tensor(upd))
        ema.update_model_average(mod)
        shadow = ema_update(shadow, {"w": jnp.asarray(upd)}, 0.9)
    np.testing.assert_allclose(np.asarray(shadow["w"]),
                               ema.shadow_params[0].detach().numpy(),
                               rtol=1e-6, atol=1e-7)
