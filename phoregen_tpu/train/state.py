"""Training state: optimizer, EMA shadow, and the adaptive grad-norm queue.

Parity targets:
- optimizer/scheduler factory (reference `utils/training_utils.py:51-83`):
  Adam(lr 1e-4) or AdamW(amsgrad, weight_decay); ReduceLROnPlateau handled
  host-side in the epoch loop (`phoregen_tpu.train.loop`) since it steps once
  per epoch on the validation loss.
- queue-based adaptive gradient clipping (reference
  `utils/training_utils.py:163-199` + seeding at `run/run.py:27-28`): a
  length-50 history of grad norms seeded with 3000; clip threshold
  `1.5*mean + 2*std`; the *clipped* value is pushed when clipping fired.
  TPU-first divergence: the queue lives inside the jitted train state as a
  fixed [50] ring buffer (no host round-trips), per SURVEY.md §7.4.
- EMA shadow params (reference `models/model_utils.py:21-42`). Note the
  reference only updates EMA when `ema_decay < 0` (`run/run.py:138-139`) so it
  is effectively dormant; we expose `train.ema: bool` to actually enable it
  and default the *update* on, documenting the quirk.
- param freezing for fine-tune `freeze_pos` (reference
  `utils/training_utils.py:18-26`): implemented as an optax.masked zero-update
  over position-update layer params.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import TrainConfig

QUEUE_LEN = 50
QUEUE_SEED = 3000.0


@struct.dataclass
class GradNormQueue:
    """Fixed-size ring buffer of recent grad norms (jit-resident).

    `values[0:count]` are valid; `head` is the next write slot.
    """
    values: jnp.ndarray  # [QUEUE_LEN] f32
    count: jnp.ndarray   # [] int32
    head: jnp.ndarray    # [] int32

    @classmethod
    def create(cls) -> "GradNormQueue":
        vals = jnp.zeros((QUEUE_LEN,), jnp.float32).at[0].set(QUEUE_SEED)
        return cls(values=vals, count=jnp.asarray(1, jnp.int32),
                   head=jnp.asarray(1, jnp.int32))

    def stats(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(mean, std) over the valid entries."""
        idx = jnp.arange(QUEUE_LEN)
        valid = (idx < self.count).astype(jnp.float32)
        n = jnp.maximum(self.count.astype(jnp.float32), 1.0)
        mean = jnp.sum(self.values * valid) / n
        var = jnp.sum(valid * (self.values - mean) ** 2) / n
        return mean, jnp.sqrt(var)

    def push(self, value: jnp.ndarray) -> "GradNormQueue":
        vals = self.values.at[self.head % QUEUE_LEN].set(value)
        return GradNormQueue(
            values=vals,
            count=jnp.minimum(self.count + 1, QUEUE_LEN),
            head=(self.head + 1) % QUEUE_LEN)


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any
    grad_queue: GradNormQueue
    step: jnp.ndarray  # [] int32


def _is_frozen_pos_path(path: Tuple) -> bool:
    """True for params under a position-update layer.

    Layer naming: the position-update modules are instantiated as
    `pos_layer_with_edge` / `pos_layer_with_bond` inside each attention layer
    (see `phoregen_tpu/models/denoiser.py`), matching the reference's freeze
    targets (`utils/training_utils.py:18-26`).
    """
    for k in path:
        name = getattr(k, "key", None)
        if isinstance(name, str) and name.startswith("pos_layer"):
            return True
    return False


def make_optimizer(cfg: TrainConfig, params=None) -> optax.GradientTransformation:
    """Optax chain matching the reference factory, with inject_hyperparams so
    the host-side plateau scheduler can mutate the lr between epochs."""
    ocfg = cfg.optimizer
    if ocfg.type == "adam":
        base = optax.inject_hyperparams(optax.adam)(learning_rate=ocfg.lr)
    elif ocfg.type == "adamw":
        def adamw(learning_rate):
            return optax.adamw(learning_rate, weight_decay=ocfg.weight_decay)
        base = optax.inject_hyperparams(adamw)(learning_rate=ocfg.lr)
    else:
        raise NotImplementedError(f"Optimizer not supported: {ocfg.type}")

    if cfg.freeze_pos:
        assert params is not None, "freeze_pos needs params for the mask"
        mask = jax.tree_util.tree_map_with_path(
            lambda path, _: not _is_frozen_pos_path(path), params)
        base = optax.chain(
            optax.masked(base, mask),
            optax.masked(optax.set_to_zero(),
                         jax.tree_util.tree_map(lambda m: not m, mask)))
    return base


def get_learning_rate(opt_state) -> float:
    """Read the current lr out of the injected hyperparams."""
    hp = _find_hyperparams(opt_state)
    return float(hp["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    """Return opt_state with the injected lr replaced (host-side, cheap)."""
    def rec(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            hp = dict(s.hyperparams)
            hp["learning_rate"] = jnp.asarray(
                lr, dtype=jnp.asarray(hp["learning_rate"]).dtype)
            return s._replace(hyperparams=hp)
        if isinstance(s, tuple):
            new = tuple(rec(c) for c in s)
            # preserve NamedTuple states (e.g. optax MaskedState)
            return type(s)(*new) if hasattr(s, "_fields") else new
        return s
    return rec(opt_state)


def _find_hyperparams(opt_state):
    if hasattr(opt_state, "hyperparams") and \
            "learning_rate" in opt_state.hyperparams:
        return opt_state.hyperparams
    if isinstance(opt_state, tuple):
        for s in opt_state:
            try:
                return _find_hyperparams(s)
            except ValueError:
                continue
    raise ValueError("no injected hyperparams found in opt_state")


def create_train_state(cfg: TrainConfig, params) -> TrainState:
    tx = make_optimizer(cfg, params)

    # jitted: one compile instead of per-leaf eager dispatch, and the EMA
    # shadow comes out as distinct buffers from params (donation-safe —
    # donating a state whose params and ema alias the same buffer is an
    # XLA error: "attempt to donate the same buffer twice").
    def build(params):
        return TrainState(
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree_util.tree_map(lambda p: p + 0.0, params),
            grad_queue=GradNormQueue.create(),
            step=jnp.asarray(0, jnp.int32))

    return jax.jit(build)(params)


def clip_by_queue(grads, queue: GradNormQueue
                  ) -> Tuple[Any, GradNormQueue, jnp.ndarray]:
    """Adaptive clip: threshold = 1.5*mean + 2*std of history; push the
    post-clip norm (reference `utils/training_utils.py:184-196`)."""
    mean, std = queue.stats()
    max_norm = 1.5 * mean + 2.0 * std
    gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-12))
    clipped = jax.tree_util.tree_map(lambda g: g * scale, grads)
    queue = queue.push(jnp.minimum(gnorm, max_norm))
    return clipped, queue, gnorm


def clip_fixed(grads, max_norm: float) -> Tuple[Any, jnp.ndarray]:
    gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-12))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), gnorm


def ema_update(ema_params, params, decay: float):
    """shadow = decay*shadow + (1-decay)*params (reference
    `models/model_utils.py:30-36`)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)
