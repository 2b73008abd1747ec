"""The training runtime: epoch loop, plateau LR schedule, checkpoints.

Parity target: `Run.train` / `run_on_epoch` (reference `run/run.py:20-156`)
and the DDP variant (:160-312), re-designed TPU-first:
- one jitted data-parallel train step replaces the per-batch
  backward/clip/step Python code; gradient reduction is XLA `psum` over the
  `data` mesh axis instead of DDP/NCCL allreduce;
- the whole epoch loop is host-orchestrated (plateau scheduling on the
  validation loss is once-per-epoch, reference `run/run.py:40-41`,
  `utils/training_utils.py:73-83`);
- checkpoints: `last_model.*` every epoch, `best_model.*` on best valid loss
  (reference `run/logger.py:216-242`);
- stage-2 warm start from a pretrain checkpoint when `dataset.checkpoint` is
  set and the dataset is pdbbind (reference `run/run.py:54-56`).
"""
from __future__ import annotations

import os
import shutil
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from ..config import Config
from ..data.loader import PhoreDataLoader, RawSample
from ..models.phoregen import PhoreGen
from ..parallel.mesh import make_mesh, replicate
from .checkpoint import (load_checkpoint, load_params_only, save_checkpoint)
from .logger import MetricLogger
from .state import TrainState, create_train_state, get_learning_rate, \
    set_learning_rate
from .step import make_eval_step, make_train_step


def mix_step_seed(seed: int, epoch: int, mode: str, idx: int) -> np.uint32:
    """splitmix-style host-scalar seed for one step: mixes (run seed, epoch,
    train/valid mode, batch index) so no two steps of a run collide.
    uint64 wraparound is intentional (masked from numpy's overflow warning)."""
    with np.errstate(over="ignore"):
        mode_salt = np.uint64(0x9E3779B97F4A7C15 if mode == "train"
                              else 0xC2B2AE3D27D4EB4F)
        base = (np.uint64(seed) * np.uint64(0x100000001B3)
                ^ (np.uint64(epoch) * np.uint64(0x9E3779B97F4A7C15))
                ^ mode_salt)
        mixed = (base + np.uint64(idx)) * np.uint64(0xBF58476D1CE4E5B9)
        return np.uint32((mixed ^ (mixed >> np.uint64(31)))
                         & np.uint64(0xFFFFFFFF))


class PlateauScheduler:
    """ReduceLROnPlateau(min): factor, patience, min_lr — host-side
    (reference `utils/training_utils.py:73-83`)."""

    def __init__(self, factor: float, patience: int, min_lr: float,
                 lr: float):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.lr = lr
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        if metric < self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr

    def state_dict(self) -> Dict:
        return {"lr": self.lr, "best": self.best,
                "bad_epochs": self.bad_epochs}

    def load_state_dict(self, d: Dict):
        self.lr = d.get("lr", self.lr)
        self.best = d.get("best", self.best)
        self.bad_epochs = d.get("bad_epochs", self.bad_epochs)


class Run:
    """Builds logger -> model -> state -> loaders; runs the epoch loop."""

    def __init__(self, config: Config, run_dir: Optional[str] = None):
        self.config = config
        self.logger = MetricLogger(config, run_dir=run_dir)
        self.mesh = make_mesh(config.train.num_devices,
                              config.train.data_axis)
        self.pg = PhoreGen(config)
        self.train_step = None
        self.eval_step = None
        self.state: Optional[TrainState] = None
        self.scheduler: Optional[PlateauScheduler] = None

    # ----- init -----
    def init_state(self, example_batch) -> TrainState:
        cfg = self.config
        key = jax.random.PRNGKey(cfg.train.seed)
        params = self.pg.init_params(key, example_batch)
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(params))
        self.logger.log(f"Model initialized with {n_params/1e6:.4f} M "
                        "parameters")

        # stage-2 warm start (reference run/run.py:54-56)
        ds = cfg.dataset
        if ds.data_name == "pdbbind" and ds.checkpoint and \
                os.path.exists(ds.checkpoint + ".msgpack"):
            params = load_params_only(ds.checkpoint, params)
            self.logger.log(
                f"Loaded pretrained zinc weights from {ds.checkpoint}")

        state = create_train_state(cfg.train, params)
        self.scheduler = PlateauScheduler(
            cfg.train.scheduler.lr_decay_factor,
            cfg.train.scheduler.scheduler_patience,
            cfg.train.scheduler.min_lr,
            # start from the float32 read-back so no-op plateau steps
            # compare equal and skip the opt_state rewrite
            get_learning_rate(state.opt_state))

        # resume (reference run/logger.py:154-203, run/run.py:63-71)
        last = os.path.join(self.logger.run_dir, "last_model")
        if self.logger.resume and os.path.exists(last + ".msgpack"):
            state, meta = load_checkpoint(last, state)
            self.scheduler.load_state_dict(meta.get("scheduler", {}))
            self.logger.log(f"Resumed from epoch {meta.get('epoch')}")

        self.train_step = make_train_step(
            self.pg, cfg, self.mesh,
            params_for_mask=params if cfg.train.freeze_pos else None)
        self.eval_step = make_eval_step(self.pg, cfg, self.mesh)
        self.state = replicate(state, self.mesh)
        return self.state

    # ----- epoch bodies -----
    def run_on_epoch(self, loader: PhoreDataLoader, mode: str,
                     epoch: int) -> None:
        cfg = self.config
        self.logger.start()
        loader.set_epoch(epoch)
        # host-scalar seeds; the jitted step derives its PRNG key on-device.
        # splitmix-style mixing over (seed, epoch, mode, idx) — structured
        # increments would collide across epochs on large datasets
        multi_host = jax.process_count() > 1
        if multi_host:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data_sh = NamedSharding(self.mesh, P(cfg.train.data_axis))
        # optional jax.profiler capture of steps [1, 1+N) of epoch 0
        prof_n = cfg.logger.profile_steps if (
            mode == "train" and epoch == 0) else 0
        prof_active = False
        for idx, (batch, real_size) in enumerate(loader.iter_with_sizes()):
            if prof_n and idx == 1:
                jax.profiler.start_trace(
                    os.path.join(self.logger.run_dir, "profile"))
                prof_active = True
            if prof_active and idx == 1 + prof_n:
                jax.profiler.stop_trace()
                prof_active = False
                self.logger.log("Profiler trace written to "
                                f"{self.logger.run_dir}/profile")
            seed = mix_step_seed(cfg.train.seed, epoch, mode, idx)
            # rows >= real_size in a cycled tail batch are duplicates; the
            # eval step zero-weights them so epoch means are exact over
            # distinct samples (train steps don't consume the mask)
            gmask = None
            if mode != "train":
                gmask = np.arange(loader.batch_size) < real_size
                if multi_host:
                    from ..parallel.mesh import local_batch_slice
                    gmask = gmask[local_batch_slice(len(gmask))]
            if multi_host:
                # assemble the global array from per-host batch slices
                # (the loader yields only this process's rows)
                batch = jax.tree_util.tree_map(
                    lambda x: jax.make_array_from_process_local_data(
                        data_sh, np.asarray(x)), batch)
                if gmask is not None:
                    gmask = jax.make_array_from_process_local_data(data_sh,
                                                                   gmask)
            if mode == "train":
                self.state, metrics = self.train_step(self.state, seed, batch)
            else:
                metrics = self.eval_step(self.state.params, seed, batch,
                                         gmask)
            self.logger.record(jax.device_get(metrics), mode=mode,
                               weight=real_size / loader.batch_size)
            if mode == "train" and idx and \
                    idx % cfg.train.n_report_steps == 0:
                m = {k: float(np.asarray(v)) for k, v in metrics.items()}
                self.logger.log(
                    f"Epoch {epoch} batch {idx}/{len(loader)} "
                    f"loss {m['loss']:.2f} grad_norm {m['grad_norm']:.1f}")
        if prof_active:  # short epoch: close the trace cleanly
            jax.profiler.stop_trace()
        self.logger.summarize_epoch(mode)

    # ----- top-level train -----
    def train(self, train_samples: Sequence[RawSample],
              valid_samples: Sequence[RawSample],
              epochs: Optional[int] = None) -> Dict:
        cfg = self.config
        epochs = epochs if epochs is not None else cfg.train.epochs
        train_loader = PhoreDataLoader(
            train_samples, cfg, cfg.train.batch_size, shuffle=True,
            seed=cfg.train.seed, augment=True)
        valid_loader = PhoreDataLoader(
            valid_samples, cfg, cfg.train.batch_size, shuffle=False,
            augment=False)

        have_valid = len(valid_loader) > 0
        if not have_valid:
            self.logger.log("validation set is empty: best-checkpoint and "
                            "plateau scheduling fall back to train loss", "W")

        if self.state is None:
            src = valid_loader if have_valid else train_loader
            example = next(iter(src))
            self.init_state(example)

        for epoch in range(self.logger.start_epoch, epochs):
            self.logger.add_new_epoch(epoch)
            self.logger.lr = get_learning_rate(self.state.opt_state)
            self.run_on_epoch(train_loader, "train", epoch)
            if have_valid:
                self.run_on_epoch(valid_loader, "valid", epoch)

            is_best = self.logger.update_best()
            self.save(epoch, is_best)
            self.logger.flush_history()

            # plateau schedule on validation loss (reference run/run.py:40-41);
            # train loss when no validation split is configured
            src_hist = self.logger.history["valid" if have_valid else "train"]
            valid_loss = src_hist[-1]["loss"]
            new_lr = self.scheduler.step(valid_loss)
            if abs(new_lr - get_learning_rate(self.state.opt_state)) > 1e-12:
                self.state = self.state.replace(opt_state=set_learning_rate(
                    self.state.opt_state, new_lr))
                self.logger.log(f"Plateau: lr -> {new_lr:.3e}")
        self.logger.close()
        return self.logger.history

    def save(self, epoch: int, is_best: bool):
        extra = {"scheduler": self.scheduler.state_dict()}
        cfgd = self.config.to_dict()
        last = os.path.join(self.logger.run_dir, "last_model")
        save_checkpoint(last, self.state, epoch, cfgd, extra)
        if is_best:
            best = os.path.join(self.logger.run_dir, "best_model")
            save_checkpoint(best, self.state, epoch, cfgd, extra)
        # milestone snapshots of the best model at epochs 160/250 for
        # non-pdbbind (pretrain) runs — reference `run/logger.py:240-242`
        if (self.config.dataset.data_name != "pdbbind"
                and epoch in (160, 250)):
            snap = os.path.join(
                self.logger.run_dir,
                f"best_model_epoch{self.logger.best_epoch}")
            best = os.path.join(self.logger.run_dir, "best_model")
            for ext in (".msgpack", ".json"):
                if os.path.exists(best + ext):
                    shutil.copyfile(best + ext, snap + ext)
