"""Compiled train/eval steps with data-parallel sharding.

Parity target: the per-batch body of `Run.run_on_epoch`
(reference `run/run.py:106-156`): ligand coordinate jitter, compute_loss,
backward, adaptive clip, optimizer step, (optional) EMA — all fused into one
jitted function here. Cross-device gradient reduction is implicit: the loss is
a mean over the sharded batch axis, so XLA's sharded autodiff inserts the
psum over the `data` mesh axis (the TPU-native replacement for DDP allreduce,
reference `run/run.py:280-283`).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..data.batching import PhoreGraphBatch
from ..models.phoregen import PhoreGen
from .state import (TrainState, clip_by_queue, clip_fixed, ema_update,
                    make_optimizer)


def make_train_step(pg: PhoreGen, cfg: Config, mesh: Optional[Mesh] = None,
                    donate: bool = True, params_for_mask=None) -> Callable:
    """Build the jitted train step: (state, key, batch) -> (state, metrics).

    With a mesh, state is replicated and the batch sharded on its leading
    axis; single-device behavior is identical (1-element mesh).
    `params_for_mask` is required when `train.freeze_pos` is set (the optax
    freeze mask is built from the param tree structure).
    """
    tcfg = cfg.train
    tx = make_optimizer(tcfg, params_for_mask)
    lig_noise_std = tcfg.lig_noise_std if tcfg.add_lig_noise else 0.0
    # mixed precision: denoiser forward/backward in bf16, f32 master params,
    # f32 optimizer state and categorical posteriors (train.dtype knob)
    compute_dtype = tcfg.dtype

    def step(state: TrainState, seed: jax.Array, batch: PhoreGraphBatch
             ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        # The per-step PRNG key is derived *inside* jit from a host scalar
        # seed: zero host-side eager RNG ops per step (host dispatch is the
        # bottleneck in sandboxed/tunneled environments). Coordinate jitter
        # happens inside compute_loss (reference run/run.py:120-122).
        key = jax.random.PRNGKey(jnp.asarray(seed, jnp.uint32))
        grad_fn = jax.value_and_grad(
            lambda p: pg.compute_loss(p, key, batch,
                                      lig_noise_std=lig_noise_std,
                                      compute_dtype=compute_dtype),
            has_aux=True)
        (_, metrics), grads = grad_fn(state.params)

        queue = state.grad_queue
        if tcfg.clip_grad and tcfg.clip_grad_mode == "queue":
            grads, queue, gnorm = clip_by_queue(grads, queue)
        elif tcfg.clip_grad:
            grads, gnorm = clip_fixed(grads, tcfg.max_grad_norm)
        else:
            gnorm = jnp.asarray(0.0)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)

        ema_params = state.ema_params
        if tcfg.ema:
            ema_params = ema_update(ema_params, params, tcfg.ema_decay)

        metrics = dict(metrics)
        metrics["grad_norm"] = gnorm
        new_state = TrainState(params=params, opt_state=opt_state,
                               ema_params=ema_params, grad_queue=queue,
                               step=state.step + 1)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    batch_sh = _batch_shardings(mesh, tcfg.data_axis)
    return jax.jit(
        step,
        in_shardings=(repl, repl, batch_sh),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else ())


def _batch_shardings(mesh: Mesh, axis: str) -> PhoreGraphBatch:
    """A PhoreGraphBatch of NamedShardings: every leaf batch-sharded."""
    data = NamedSharding(mesh, P(axis))
    n_fields = len(PhoreGraphBatch.__dataclass_fields__)
    return PhoreGraphBatch(*([data] * n_fields))


def make_eval_step(pg: PhoreGen, cfg: Config, mesh: Optional[Mesh] = None
                   ) -> Callable:
    """Jitted validation step: (params, seed, batch[, graph_mask]) ->
    metrics (no grad, no coordinate jitter — reference `run/run.py:113-117`
    eval mode). `graph_mask` [B] excludes cycled tail-batch duplicate rows
    from every metric reduction, making epoch means exact over distinct
    samples (the reference gets this from variable last-batch sizes)."""
    def step(params, seed: jax.Array, batch: PhoreGraphBatch,
             graph_mask=None):
        key = jax.random.PRNGKey(jnp.asarray(seed, jnp.uint32))
        _, metrics = pg.compute_loss(params, key, batch, lig_noise_std=0.0,
                                     compute_dtype=cfg.train.dtype,
                                     graph_mask=graph_mask)
        return metrics

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    batch_sh = _batch_shardings(mesh, cfg.train.data_axis)
    gm_sh = NamedSharding(mesh, P(cfg.train.data_axis))
    return jax.jit(step, in_shardings=(repl, repl, batch_sh, gm_sh),
                   out_shardings=repl)
