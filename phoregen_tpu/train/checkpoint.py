"""Checkpoint save/load with last/best + resume + warm-start semantics.

Parity target: `Logger.save_status` / `load_previous_status`
(reference `run/logger.py:154-242`): every epoch write `last_model.*`, on a
new best validation loss also `best_model.*`; checkpoints carry
{model, optimizer, scheduler(lr), ema, epoch, config}; stage-2 fine-tuning
warm-starts model weights only from a pretrain checkpoint
(reference `run/run.py:54-56`).

Format: flax.serialization msgpack for the array state (replicated-layout
arrays, reshard-safe — they are host numpy on save) + a JSON sidecar for
epoch/lr/config. No torch pickle format.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from .state import TrainState, get_learning_rate, set_learning_rate


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path_prefix: str, state: TrainState, epoch: int,
                    config_dict: Dict[str, Any],
                    extra: Optional[Dict[str, Any]] = None) -> None:
    """Write `<prefix>.msgpack` + `<prefix>.json`."""
    host_state = _to_host(state)
    with open(path_prefix + ".msgpack", "wb") as f:
        f.write(serialization.to_bytes(host_state))
    meta = {
        "epoch": int(epoch),
        "step": int(np.asarray(state.step)),
        "lr": get_learning_rate(state.opt_state),
        "config": config_dict,
    }
    if extra:
        meta.update(extra)
    with open(path_prefix + ".json", "w") as f:
        json.dump(meta, f, indent=1, default=str)


def save_release(path_prefix: str, state: TrainState,
                 config_dict: Dict[str, Any],
                 extra: Optional[Dict[str, Any]] = None,
                 use_ema: bool = False) -> None:
    """Write a params-only *release* checkpoint (`release: true` sidecar):
    the distributable analogue of the reference's published .pt weights —
    ~4x smaller than a full TrainState (no optimizer moments), loadable by
    `load_checkpoint`/the sample CLI but not resumable for training."""
    params = state.ema_params if use_ema else state.params
    with open(path_prefix + ".msgpack", "wb") as f:
        f.write(serialization.to_bytes({"params": _to_host(params)}))
    meta = {
        "release": True,
        "ema": bool(use_ema),
        "step": int(np.asarray(state.step)),
        "config": config_dict,
    }
    if extra:
        meta.update(extra)
    with open(path_prefix + ".json", "w") as f:
        json.dump(meta, f, indent=1, default=str)


def load_checkpoint(path_prefix: str, state_template: TrainState
                    ) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore a TrainState from `<prefix>.msgpack` using a freshly-created
    state as the shape/structure template; returns (state, meta).

    Release checkpoints (params-only, `release: true` in the sidecar)
    restore into the template's params with fresh optimizer state."""
    meta = {}
    if os.path.exists(path_prefix + ".json"):
        with open(path_prefix + ".json") as f:
            meta = json.load(f)
    with open(path_prefix + ".msgpack", "rb") as f:
        blob = f.read()
    if meta.get("release"):
        full = serialization.msgpack_restore(blob)
        params = serialization.from_state_dict(state_template.params,
                                               full["params"])
        return state_template.replace(params=params), meta
    state = serialization.from_bytes(state_template, blob)
    if "lr" in meta:
        state = state.replace(
            opt_state=set_learning_rate(state.opt_state, meta["lr"]))
    return state, meta


def load_params_only(path_prefix: str, params_template) -> Any:
    """Warm-start: restore only the model params from a full checkpoint
    (reference `run/run.py:54-56` pdbbind <- zinc weights)."""
    with open(path_prefix + ".msgpack", "rb") as f:
        blob = f.read()
    full = serialization.msgpack_restore(blob)
    return serialization.from_state_dict(params_template, full["params"])


def prepare_run_dir(run_dir: str, restart: str = "none") -> bool:
    """Run-directory collision policy (reference `run/logger.py:30-62`).

    Returns True when resuming from an existing directory.
    Modes: none (error if exists), overwrite (rm -rf), backup (move old dir
    aside then resume fresh copies), inplace (resume in place),
    finetuning (fresh run dir, weights loaded separately by caller).
    """
    exists = os.path.isdir(run_dir) and os.listdir(run_dir)
    if not exists:
        os.makedirs(run_dir, exist_ok=True)
        return False
    if restart == "none":
        raise FileExistsError(
            f"run dir {run_dir} exists; set logger.restart to "
            "overwrite/backup/inplace/finetuning")
    if restart == "overwrite":
        shutil.rmtree(run_dir)
        os.makedirs(run_dir)
        return False
    if restart == "backup":
        i = 1
        while os.path.isdir(f"{run_dir}.bak{i}"):
            i += 1
        shutil.copytree(run_dir, f"{run_dir}.bak{i}")
        return True
    if restart == "inplace":
        return True
    if restart == "finetuning":
        return False
    raise ValueError(f"unknown restart mode: {restart}")
