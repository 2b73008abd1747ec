"""Training-runtime tests: jitted step, adaptive clipping, EMA, plateau,
checkpoint round-trip, and the full epoch loop on an 8-device CPU mesh."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phoregen_tpu.config import default_config
from phoregen_tpu.data.loader import PhoreDataLoader
from phoregen_tpu.data.synthetic import synthetic_dataset
from phoregen_tpu.models.phoregen import PhoreGen
from phoregen_tpu.parallel.mesh import make_mesh, replicate
from phoregen_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from phoregen_tpu.train.loop import PlateauScheduler, Run
from phoregen_tpu.train.state import (GradNormQueue, QUEUE_SEED,
                                      create_train_state, get_learning_rate,
                                      set_learning_rate)
from phoregen_tpu.train.step import make_train_step


def tiny_config(**train_overrides):
    cfg = default_config("zinc_300")
    m = cfg.model
    m.hidden_dim = 16
    m.denoiser.hidden_dim = 16
    m.denoiser.num_layers = 1
    m.denoiser.n_heads = 2
    m.denoiser.knn = 4
    m.denoiser.num_r_gaussian = 4
    m.diff.num_timesteps = 8
    m.diff.time_dim = 2
    cfg.dataset.ligand_buckets = [16]
    cfg.dataset.max_phore = 16
    cfg.train.batch_size = 8
    cfg.train.epochs = 2
    for k, v in train_overrides.items():
        setattr(cfg.train, k, v)
    return cfg


def test_gradnorm_queue_semantics():
    q = GradNormQueue.create()
    mean, std = q.stats()
    assert float(mean) == pytest.approx(QUEUE_SEED)
    assert float(std) == pytest.approx(0.0)
    q = q.push(jnp.asarray(100.0))
    mean, std = q.stats()
    assert float(mean) == pytest.approx((QUEUE_SEED + 100.0) / 2)
    # ring wrap: push 60 values, count saturates at 50
    for i in range(60):
        q = q.push(jnp.asarray(float(i)))
    assert int(q.count) == 50


def test_plateau_scheduler():
    s = PlateauScheduler(factor=0.5, patience=1, min_lr=1e-6, lr=1.0)
    assert s.step(1.0) == 1.0      # new best
    assert s.step(2.0) == 1.0      # bad 1 (<= patience)
    assert s.step(2.0) == 0.5      # bad 2 -> decay
    assert s.step(0.5) == 0.5      # new best again
    for _ in range(40):
        s.step(9.9)
    assert s.lr >= 1e-6


def test_lr_get_set_roundtrip():
    cfg = tiny_config()
    key = jax.random.PRNGKey(0)
    loader = PhoreDataLoader(synthetic_dataset(0, 8, max_atoms=12), cfg,
                             cfg.train.batch_size, shuffle=False)
    batch = next(iter(loader))
    pg = PhoreGen(cfg)
    params = pg.init_params(key, batch)
    state = create_train_state(cfg.train, params)
    assert get_learning_rate(state.opt_state) == pytest.approx(1e-4)
    new = set_learning_rate(state.opt_state, 5e-5)
    assert get_learning_rate(new) == pytest.approx(5e-5)


@pytest.mark.slow
def test_train_step_descends_on_mesh():
    """2 jitted steps on the 8-device mesh: loss finite, params change,
    grad queue advances, EMA tracks."""
    cfg = tiny_config()
    mesh = make_mesh(8, "data")
    pg = PhoreGen(cfg)
    loader = PhoreDataLoader(synthetic_dataset(1, 16, max_atoms=12), cfg,
                             cfg.train.batch_size, shuffle=False)
    batch = next(iter(loader))
    key = jax.random.PRNGKey(0)
    params = pg.init_params(key, batch)
    state = replicate(create_train_state(cfg.train, params), mesh)
    step = make_train_step(pg, cfg, mesh, donate=False)
    state1, m1 = step(state, np.uint32(0), batch)
    state2, m2 = step(state1, np.uint32(1), batch)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert int(state2.step) == 2
    assert int(state2.grad_queue.count) == 3  # seed + 2 pushes
    # params actually moved (some leaves, e.g. the QD count-head bias, can
    # legitimately get ~zero grad early when its sigmoids saturate)
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(state2.params)))
    assert moved


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config()
    pg = PhoreGen(cfg)
    loader = PhoreDataLoader(synthetic_dataset(2, 8, max_atoms=12), cfg,
                             cfg.train.batch_size, shuffle=False)
    batch = next(iter(loader))
    key = jax.random.PRNGKey(0)
    params = pg.init_params(key, batch)
    state = create_train_state(cfg.train, params)
    state = state.replace(opt_state=set_learning_rate(state.opt_state, 3e-5))
    prefix = str(tmp_path / "last_model")
    save_checkpoint(prefix, state, epoch=7, config_dict=cfg.to_dict(),
                    extra={"scheduler": {"lr": 3e-5}})
    fresh = create_train_state(cfg.train, params)
    restored, meta = load_checkpoint(prefix, fresh)
    assert meta["epoch"] == 7
    assert get_learning_rate(restored.opt_state) == pytest.approx(3e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_release_checkpoint_roundtrip(tmp_path):
    """Params-only release checkpoints restore through load_checkpoint
    (fresh optimizer state) and are ~4x smaller than a full TrainState."""
    import os

    from phoregen_tpu.train.checkpoint import save_release

    cfg = tiny_config()
    pg = PhoreGen(cfg)
    loader = PhoreDataLoader(synthetic_dataset(3, 8, max_atoms=12), cfg,
                             cfg.train.batch_size, shuffle=False)
    batch = next(iter(loader))
    params = pg.init_params(jax.random.PRNGKey(1), batch)
    state = create_train_state(cfg.train, params)
    full_prefix = str(tmp_path / "full")
    rel_prefix = str(tmp_path / "release")
    save_checkpoint(full_prefix, state, epoch=1, config_dict=cfg.to_dict())
    save_release(rel_prefix, state, cfg.to_dict(), extra={"note": "t"})
    assert (os.path.getsize(rel_prefix + ".msgpack")
            < 0.4 * os.path.getsize(full_prefix + ".msgpack"))
    fresh = create_train_state(cfg.train, params)
    restored, meta = load_checkpoint(rel_prefix, fresh)
    assert meta["release"] is True and meta["note"] == "t"
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_run_epoch_loop_end_to_end(tmp_path):
    """Full Run.train: 2 epochs on synthetic data, history + checkpoints
    written, resume picks up at epoch 2."""
    cfg = tiny_config()
    cfg.logger.result = str(tmp_path)
    cfg.logger.run_name = "t"
    cfg.logger.tensorboard = False
    cfg.train.num_devices = 8
    run = Run(cfg)
    train = synthetic_dataset(3, 16, max_atoms=12)
    valid = synthetic_dataset(4, 8, max_atoms=12)
    hist = run.train(train, valid, epochs=2)
    assert len(hist["train"]) == 2 and len(hist["valid"]) == 2
    assert np.isfinite(hist["valid"][-1]["loss"])
    run_dir = os.path.join(str(tmp_path), "t")
    assert os.path.exists(os.path.join(run_dir, "last_model.msgpack"))
    assert os.path.exists(os.path.join(run_dir, "best_model.msgpack"))
    assert os.path.exists(os.path.join(run_dir, "history.log"))
    with open(os.path.join(run_dir, "history.log")) as f:
        h = json.load(f)
    assert h["epoch"] == 1

    # resume: inplace restart continues from epoch 2
    cfg2 = tiny_config()
    cfg2.logger.result = str(tmp_path)
    cfg2.logger.run_name = "t"
    cfg2.logger.restart = "inplace"
    cfg2.logger.tensorboard = False
    cfg2.train.num_devices = 8
    run2 = Run(cfg2)
    assert run2.logger.start_epoch == 2
    hist2 = run2.train(train, valid, epochs=3)
    assert len(hist2["train"]) == 3


def test_mix_step_seed_unique_and_silent():
    """Seed mixing: no numpy overflow warnings, no collisions across a
    realistic (epoch, mode, idx) grid (VERDICT r1 hygiene item)."""
    import warnings
    from phoregen_tpu.train.loop import mix_step_seed
    seen = set()
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning -> failure
        for epoch in range(20):
            for mode in ("train", "valid"):
                for idx in range(50):
                    seen.add(int(mix_step_seed(2024, epoch, mode, idx)))
    assert len(seen) == 20 * 2 * 50


def test_tail_batch_weighting():
    """iter_with_sizes reports the real size of a cycled tail batch, and the
    logger's weighted mean equals the exact per-sample mean (ADVICE r1)."""
    from phoregen_tpu.train.logger import MetricLogger
    cfg = tiny_config()
    # 11 samples, batch 8 -> one full batch + one tail of 3 (cycled to 8)
    loader = PhoreDataLoader(synthetic_dataset(5, 11, max_atoms=12), cfg,
                             cfg.train.batch_size, shuffle=False,
                             drop_last=False)
    sizes = [real for _, real in loader.iter_with_sizes()]
    assert sorted(sizes) == [3, 8]
    assert len(loader) == 2

    cfg.logger.tensorboard = False
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        cfg.logger.result = d
        log = MetricLogger(cfg, run_dir=d)
        log.add_new_epoch(0)
        log.record({"loss": 1.0}, "valid", weight=8 / 8)
        log.record({"loss": 2.0}, "valid", weight=3 / 8)
        s = log.summarize_epoch("valid")
    # exact mean over 11 samples: (8*1 + 3*2) / 11
    assert s["loss"] == pytest.approx((8 * 1.0 + 3 * 2.0) / 11)
    assert "_weight" not in s


def test_train_only_no_valid_split(tmp_path):
    """Run.train with an empty validation set must not crash: init example
    comes from the train loader, best/plateau fall back to train loss
    (ADVICE r1 medium)."""
    cfg = tiny_config()
    cfg.logger.result = str(tmp_path)
    cfg.logger.run_name = "novalid"
    cfg.logger.tensorboard = False
    cfg.train.num_devices = 8
    run = Run(cfg)
    hist = run.train(synthetic_dataset(6, 16, max_atoms=12), [], epochs=1)
    assert len(hist["train"]) == 1 and hist["valid"] == []
    assert np.isfinite(hist["train"][-1]["loss"])
    run_dir = os.path.join(str(tmp_path), "novalid")
    assert os.path.exists(os.path.join(run_dir, "best_model.msgpack"))


@pytest.mark.slow
def test_bf16_mixed_precision_training():
    """train.dtype=bfloat16: denoiser runs in bf16, master params stay f32,
    loss tracks the f32 loss on the same batch/key, and a step descends.
    Parity target: loss semantics of reference `models/diffusion.py:249-352`
    must be unchanged by the precision of the network forward."""
    cfg32 = tiny_config()
    cfg16 = tiny_config(dtype="bfloat16")
    loader = PhoreDataLoader(synthetic_dataset(7, 16, max_atoms=12), cfg32,
                             cfg32.train.batch_size, shuffle=False)
    batch = next(iter(loader))
    key = jax.random.PRNGKey(0)
    pg = PhoreGen(cfg32)
    params = pg.init_params(key, batch)

    loss32, _ = jax.jit(
        lambda p, k, b: pg.compute_loss(p, k, b, compute_dtype="float32")
    )(params, key, batch)
    loss16, _ = jax.jit(
        lambda p, k, b: pg.compute_loss(p, k, b, compute_dtype="bfloat16")
    )(params, key, batch)
    assert np.isfinite(float(loss32)) and np.isfinite(float(loss16))
    # same math, reduced mantissa: a few % at init-scale losses
    assert abs(float(loss16) - float(loss32)) / abs(float(loss32)) < 0.05

    mesh = make_mesh(8, "data")
    state = replicate(create_train_state(cfg16.train, params), mesh)
    step = make_train_step(pg, cfg16, mesh, donate=False)
    state1, m1 = step(state, np.uint32(0), batch)
    assert np.isfinite(float(m1["loss"]))
    # master params remain f32 after the bf16 step
    for leaf in jax.tree_util.tree_leaves(state1.params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    # grads flowed: at least one leaf moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(state1.params)))
    assert moved


@pytest.mark.slow
def test_milestone_best_snapshot(tmp_path):
    """Epochs 160/250 copy the current best checkpoint to a named snapshot
    for non-pdbbind runs (reference `run/logger.py:240-242`)."""
    cfg = tiny_config()
    cfg.logger.result = str(tmp_path)
    cfg.logger.run_name = "snap"
    cfg.logger.tensorboard = False
    cfg.train.num_devices = 8
    run = Run(cfg)
    train = synthetic_dataset(9, 16, max_atoms=12)
    run.train(train, train[:8], epochs=1)
    run.logger.best_epoch = 0
    run.save(epoch=160, is_best=False)
    run_dir = os.path.join(str(tmp_path), "snap")
    assert os.path.exists(os.path.join(run_dir,
                                       "best_model_epoch0.msgpack"))
    assert os.path.exists(os.path.join(run_dir, "best_model_epoch0.json"))
    # pdbbind runs do not snapshot
    run.config.dataset.data_name = "pdbbind"
    run.save(epoch=250, is_best=False)
    assert not os.path.exists(os.path.join(run_dir,
                                           "best_model_epoch0_x.msgpack"))
    names = os.listdir(run_dir)
    assert sum(n.startswith("best_model_epoch") for n in names) == 2


@pytest.mark.slow
def test_eval_graph_mask_excludes_duplicates():
    """Cycled tail-batch duplicates contribute exactly zero mass to eval
    metrics: with graph_mask, the metrics are invariant to WHICH sample
    fills the duplicate slots (code-review r2 finding on loader.py)."""
    from phoregen_tpu.train.step import make_eval_step
    cfg = tiny_config()
    from phoregen_tpu.models.phoregen import PhoreGen
    pg = PhoreGen(cfg)
    B = cfg.train.batch_size
    samples = synthetic_dataset(11, B, max_atoms=12)
    loader = PhoreDataLoader(samples, cfg, B, shuffle=False)
    full = next(iter(loader))
    params = pg.init_params(jax.random.PRNGKey(0), full)
    eval_fn = make_eval_step(pg, cfg)

    # tail of 3 real samples, padded by cycling sample 0 vs sample 1
    real = 3
    tail_a = PhoreDataLoader(
        [samples[i] for i in ([0, 1, 2] + [0] * (B - real))], cfg, B,
        shuffle=False)
    tail_b = PhoreDataLoader(
        [samples[i] for i in ([0, 1, 2] + [1] * (B - real))], cfg, B,
        shuffle=False)
    ba = next(iter(tail_a))
    bb = next(iter(tail_b))
    gmask = np.arange(B) < real
    ma = jax.device_get(eval_fn(params, np.uint32(7), ba, gmask))
    mb = jax.device_get(eval_fn(params, np.uint32(7), bb, gmask))
    for k in ma:
        np.testing.assert_allclose(ma[k], mb[k], rtol=1e-5, err_msg=k)
    # and the mask actually matters: unmasked metrics differ
    mc = jax.device_get(eval_fn(params, np.uint32(7), ba, None))
    assert any(abs(float(ma[k]) - float(mc[k])) > 1e-7 for k in ma)
