"""End-to-end generation pipeline test on a tiny model: phore file ->
count interval -> compiled reverse sampling -> decode -> reconstruction ->
SDF/SMILES outputs (reference sample_all.py flow, SURVEY.md §3.3)."""
import os

import jax
import numpy as np
import pytest

from phoregen_tpu.data.phore import parse_phore_text
from phoregen_tpu.models.phoregen import PhoreGen
from phoregen_tpu.sample.pipeline import GenerationPipeline
from phoregen_tpu.sample.sampler import GuidanceOpt
from tests.test_train import tiny_config

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PHORE_TEXT = """pipe_phore
AR\t1.0\t1\t1\t1.0\t2.0\t3.0\t1\t0.0\t0.0\t1.0\t0\t1
HD\t0.7\t1\t1\t-1.0\t0.5\t2.0\t0\t0.0\t0.0\t0.0\t0\t1
HY\t1.0\t1\t1\t0.5\t-1.0\t1.0\t0\t0.0\t0.0\t0.0\t0\t1
EX\t0.837\t0.5\t1\t4.0\t4.0\t4.0\t0\t0.0\t0.0\t0.0\t0\t1
$$$$
"""


@pytest.fixture(scope="module")
def pipeline():
    cfg = tiny_config()
    pg = PhoreGen(cfg)
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.synthetic import synthetic_dataset
    loader = PhoreDataLoader(synthetic_dataset(0, 4, max_atoms=12), cfg, 4,
                             shuffle=False)
    params = pg.init_params(jax.random.PRNGKey(0), next(iter(loader)))
    return GenerationPipeline(
        pg, params,
        guidance=[GuidanceOpt(type="atom_prox", min_d=1.0, max_d=3.0),
                  GuidanceOpt(type="center_prox")],
        batch_size=4, add_edge="predicted", seed=5)


def test_generate_outputs(pipeline, tmp_path):
    phore = parse_phore_text(PHORE_TEXT, name="pipe_phore")
    out_dir = str(tmp_path / "gen")
    os.makedirs(out_dir)
    res = pipeline.generate(phore, num_samples=2, out_dir=out_dir)
    lo, up = res["count_interval"]
    assert 4 <= lo <= up <= 78
    assert res["n_finished"] + res["n_failed"] > 0
    # outputs written for whatever succeeded
    if res["n_finished"]:
        mol_dir = os.path.join(out_dir, "pipe_phore")
        sdfs = [f for f in os.listdir(mol_dir) if f.endswith(".sdf")]
        assert len(sdfs) == res["n_finished"]
        with open(os.path.join(mol_dir, "pipe_phore_smiles.txt")) as f:
            smiles = [l.strip() for l in f if l.strip()]
        assert len(smiles) == res["n_finished"]
        assert all("." not in s for s in smiles)
    assert os.path.exists(os.path.join(out_dir, "time_chain.txt"))


@pytest.mark.slow
def test_traj_output(tmp_path):
    """keep_traj writes a multi-frame SDF trajectory for accepted mols."""
    cfg = tiny_config()
    pg = PhoreGen(cfg)
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.synthetic import synthetic_dataset
    loader = PhoreDataLoader(synthetic_dataset(1, 4, max_atoms=12), cfg, 4,
                             shuffle=False)
    params = pg.init_params(jax.random.PRNGKey(1), next(iter(loader)))
    pipe = GenerationPipeline(pg, params, batch_size=4, keep_traj=True,
                              add_edge="distance", seed=11)
    phore = parse_phore_text(PHORE_TEXT, name="traj_phore")
    out_dir = str(tmp_path / "traj")
    os.makedirs(out_dir)
    res = pipe.generate(phore, num_samples=1, out_dir=out_dir, traj_stride=4)
    if res["n_finished"]:
        traj = os.path.join(out_dir, "traj_phore", "traj_0.sdf")
        assert os.path.exists(traj)
        text = open(traj).read()
        assert text.count("$$$$") >= 2  # multiple frames


def test_fail_budget_abandons(pipeline):
    """With an untrained model some failures are expected; the loop must
    terminate within the 3x budget either way."""
    phore = parse_phore_text(PHORE_TEXT, name="pipe_phore2")
    res = pipeline.generate(phore, num_samples=2, fail_budget_factor=1)
    assert res["n_failed"] <= 1 * 2 + pipeline.batch_size  # bounded


def test_device_fault_resilience(pipeline, monkeypatch):
    """Injected device fault: the pool loop must count the batch against
    the failure budget, halve the batch, and keep going (the TPU analogue
    of the reference's per-batch OOM catch, `sample_all.py:95-99`)."""
    phore = parse_phore_text(PHORE_TEXT, name="fault_phore")
    calls = {"n": 0, "sizes": []}
    real = GenerationPipeline.sample_pool

    def flaky(self, phore_sample, n_graphs, lower, upper):
        calls["n"] += 1
        calls["sizes"].append(n_graphs)
        if calls["n"] == 1:
            raise jax.errors.JaxRuntimeError("TPU device error (injected)")
        return real(self, phore_sample, n_graphs, lower, upper)

    monkeypatch.setattr(GenerationPipeline, "sample_pool", flaky)
    res = pipeline.generate(phore, num_samples=2)
    # first pool of 2 faulted: counted as 2 failures, retried with batch 1
    assert res["n_failed"] >= 2
    assert calls["sizes"][0] == 2 and calls["sizes"][1] == 1
    assert calls["n"] >= 2  # the loop survived the fault


def test_fault_budget_exhaustion(pipeline, monkeypatch):
    """Persistent faults exhaust the 3x budget and abandon the phore
    instead of looping forever."""
    phore = parse_phore_text(PHORE_TEXT, name="dead_phore")

    def always_fault(self, *a, **k):
        raise jax.errors.JaxRuntimeError("TPU device error (injected)")

    monkeypatch.setattr(GenerationPipeline, "sample_pool", always_fault)
    res = pipeline.generate(phore, num_samples=2)
    assert res["abandoned"] and res["n_finished"] == 0
    assert res["n_failed"] >= 3 * 2


def test_two_batch_shapes_one_pipeline(pipeline):
    """Regression (round 2): the cached strided schedule used to leak
    trace-scoped constants, so compiling a SECOND batch shape raised
    UnexpectedTracerError (any pool where num_samples % batch_size != 0)."""
    phore = parse_phore_text(PHORE_TEXT, name="two_shapes")
    ps = pipeline.prepare_phore(phore)
    lo, up = pipeline._count_interval(ps)
    d4, _ = pipeline.sample_pool(ps, 4, lo, up)
    d1, _ = pipeline.sample_pool(ps, 1, lo, up)  # second shape: must compile
    assert len(d4) == 4 and len(d1) == 1


@pytest.mark.slow
def test_chunked_sampling_exact_parity():
    """sample_chunked == sample bit-for-bit: same math, same PRNG stream,
    regardless of chunk size (incl. a non-dividing one)."""
    from phoregen_tpu.data.batching import replicate_phore
    from phoregen_tpu.data.phore import parse_phore_text
    from phoregen_tpu.sample.sampler import Sampler

    cfg = tiny_config()
    pg = PhoreGen(cfg)
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.synthetic import synthetic_dataset
    loader = PhoreDataLoader(synthetic_dataset(3, 4, max_atoms=12), cfg, 4,
                             shuffle=False)
    batch = next(iter(loader))
    params = pg.init_params(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(42)

    sampler = Sampler(pg)  # T=8 in tiny_config
    ref = jax.jit(lambda p, k, b: sampler.sample(p, k, b))(params, key, batch)
    for chunk in (3, 7):  # 7 body steps: non-dividing and dividing splits
        out = sampler.sample_chunked(params, key, batch, chunk_steps=chunk)
        for k in ("pred_node", "pred_pos", "pred_edge"):
            np.testing.assert_array_equal(np.asarray(ref[k]),
                                          np.asarray(out[k]), err_msg=k)
        np.testing.assert_array_equal(
            np.asarray(ref["final_state"]["pos"]),
            np.asarray(out["final_state"]["pos"]))


@pytest.mark.slow
def test_chunked_sampling_traj_parity():
    """keep_traj through the chunked path reproduces the single-scan
    trajectory exactly (init frame, every step, final frame)."""
    from phoregen_tpu.sample.sampler import Sampler

    cfg = tiny_config()
    pg = PhoreGen(cfg)
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.synthetic import synthetic_dataset
    loader = PhoreDataLoader(synthetic_dataset(4, 4, max_atoms=12), cfg, 4,
                             shuffle=False)
    batch = next(iter(loader))
    params = pg.init_params(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(7)

    sampler = Sampler(pg, keep_traj=True)
    ref = jax.jit(lambda p, k, b: sampler.sample(p, k, b))(params, key, batch)
    out = sampler.sample_chunked(params, key, batch, chunk_steps=3)
    for k in ("node", "edge"):
        np.testing.assert_array_equal(np.asarray(ref["traj"][k]),
                                      np.asarray(out["traj"][k]), err_msg=k)
    # pos: the init frame's +center runs inside the jit for single-scan but
    # eagerly in _package for chunked -> 1-ulp fusion differences
    np.testing.assert_allclose(np.asarray(ref["traj"]["pos"]),
                               np.asarray(out["traj"]["pos"]), atol=1e-6)


@pytest.mark.slow
def test_mesh_parallel_pool_matches_single():
    """Pool-parallel sampling over an 8-device mesh: identical math to the
    single-device jit (graphs are independent -> zero collectives), and
    pool sizes not divisible by the mesh are padded then sliced."""
    from phoregen_tpu.parallel.mesh import make_mesh
    cfg = tiny_config()
    pg = PhoreGen(cfg)
    from phoregen_tpu.data.loader import PhoreDataLoader
    from phoregen_tpu.data.synthetic import synthetic_dataset
    loader = PhoreDataLoader(synthetic_dataset(2, 4, max_atoms=12), cfg, 4,
                             shuffle=False)
    params = pg.init_params(jax.random.PRNGKey(0), next(iter(loader)))
    phore = parse_phore_text(PHORE_TEXT, name="mesh_phore")

    single = GenerationPipeline(pg, params, batch_size=8, seed=11)
    mesh = make_mesh(8, "data")
    parallel = GenerationPipeline(pg, params, batch_size=8, seed=11,
                                  mesh=mesh)

    ps = single.prepare_phore(phore)
    lo, up = single._count_interval(ps)
    dec_s, raw_s = single.sample_pool(ps, 8, lo, up)
    dec_p, raw_p = parallel.sample_pool(ps, 8, lo, up)
    assert len(dec_s) == len(dec_p) == 8
    np.testing.assert_allclose(np.asarray(raw_s["pred_pos"]),
                               np.asarray(raw_p["pred_pos"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(raw_s["pred_node"]),
                                  np.asarray(raw_p["pred_node"]))

    # pool of 5 on an 8-mesh: rounded up to 8 real pool members (the
    # surplus is offered for acceptance too; generate() caps at the ask)
    dec5, _ = parallel.sample_pool(ps, 5, lo, up)
    assert len(dec5) == 8


def test_recon_worker_module_initializes_no_backend():
    """Spawned reconstruction workers must not initialize a JAX backend
    (this sandbox's sitecustomize pre-imports the jax package in every
    process, so the meaningful invariant is zero backend clients, and that
    the sample package's jax-importing modules stay unloaded)."""
    import subprocess, sys
    code = (
        "import sys; import phoregen_tpu.sample.reconstruct;\n"
        "assert 'phoregen_tpu.sample.sampler' not in sys.modules\n"
        "assert 'phoregen_tpu.sample.pipeline' not in sys.modules\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb._backends, list(xb._backends)\n"
        "print('ok')")
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO_ROOT,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "ok" in out.stdout


def test_parallel_reconstruction_matches_serial(pipeline):
    """recon_workers: same accept/fail bookkeeping as in-process serial."""
    from phoregen_tpu.sample.reconstruct import recon_task
    phore = parse_phore_text(PHORE_TEXT, name="par_phore")
    ps = pipeline.prepare_phore(phore)
    lo, up = pipeline._count_interval(ps)
    decoded, _ = pipeline.sample_pool(ps, 4, lo, up)
    serial = [recon_task(info, "predicted") for info in decoded]

    import concurrent.futures as cf
    import multiprocessing as mp
    with cf.ProcessPoolExecutor(
            2, mp_context=mp.get_context("spawn")) as pool:
        par = list(pool.map(recon_task, decoded, ["predicted"] * len(decoded)))
    assert [ok for ok, _ in par] == [ok for ok, _ in serial]
    for (ok_p, pl_p), (ok_s, pl_s) in zip(par, serial):
        if ok_p:
            assert pl_p[1] == pl_s[1]  # same smiles


def test_time_budget_abandons(pipeline):
    """A tiny per-phore wall-time budget abandons promptly (timed_out set),
    complementing the reference's fail budget for failure-heavy phores."""
    phore = parse_phore_text(PHORE_TEXT, name="pipe_phore_tb")
    res = pipeline.generate(phore, num_samples=50, fail_budget_factor=100,
                            time_budget=1e-6)
    assert res["timed_out"]
    assert res["abandoned"]
    assert res["n_finished"] == 0


def test_no_time_budget_by_default(pipeline):
    phore = parse_phore_text(PHORE_TEXT, name="pipe_phore_ntb")
    res = pipeline.generate(phore, num_samples=1, fail_budget_factor=1)
    assert res["timed_out"] is False
