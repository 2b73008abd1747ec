"""Torch-free reference-checkpoint importer (`utils/torch_import.py`).

Round-trips a synthetic zip-format torch checkpoint (written here with a
stub pickler that emits torch's exact on-disk format — no torch needed)
through `read_torch_pt` + `map_reference_state`, checks the result is
structurally identical to a fresh `PhoreDiffNet` param tree, and runs a
forward pass with the imported weights.

Reference serialization contract: `torch.save` zip archives holding
`data.pkl` (tensors as `_rebuild_tensor_v2` + persistent storage ids) and
`data/<key>` raw buffers; loaded via `torch.load(ckpt)['model']`
(reference `sample_all.py:58-59`, `run/logger.py:216-242`)."""
import io
import pickle
import zipfile

import jax
import numpy as np
import pytest

from phoregen_tpu.config import default_config
from phoregen_tpu.data.loader import PhoreDataLoader
from phoregen_tpu.data.synthetic import synthetic_dataset
from phoregen_tpu.models.phoregen import PhoreGen
from phoregen_tpu.utils.torch_import import (load_reference_checkpoint,
                                             map_reference_state,
                                             read_torch_pt)


# ---------------------------------------------------------------------------
# minimal torch-format writer (tests only)
# ---------------------------------------------------------------------------

def _rebuild_sentinel(*a):  # pickled as torch._utils._rebuild_tensor_v2
    raise NotImplementedError


class _StorageSentinel:
    def __init__(self, name):
        self.name = name


class _TensorObj:
    def __init__(self, arr, key):
        self.arr = np.ascontiguousarray(arr, np.float32)
        self.key = key


class _TorchWriter(pickle._Pickler):
    def save(self, obj, save_persistent_id=True):
        if obj is _rebuild_sentinel:
            # no memoization: emitted verbatim at every occurrence
            self.write(pickle.GLOBAL
                       + b"torch._utils\n_rebuild_tensor_v2\n")
            return
        if isinstance(obj, _StorageSentinel):
            self.write(pickle.GLOBAL + f"torch\n{obj.name}\n".encode())
            return
        if isinstance(obj, _TensorObj):
            strides = tuple(s // obj.arr.itemsize for s in obj.arr.strides)
            self.save_reduce(
                _rebuild_sentinel,
                (_StorageRef(obj.key, obj.arr.size), 0,
                 tuple(obj.arr.shape), strides, False, None), obj=obj)
            return
        super().save(obj, save_persistent_id)

    def persistent_id(self, obj):
        if isinstance(obj, _StorageRef):
            return ("storage", _StorageSentinel("FloatStorage"), obj.key,
                    "cpu", obj.numel)
        return None


class _StorageRef:
    def __init__(self, key, numel):
        self.key = key
        self.numel = numel


def write_torch_pt(path, obj_with_tensors, tensors):
    """tensors: {key: _TensorObj}."""
    buf = io.BytesIO()
    _TorchWriter(buf, protocol=2).dump(obj_with_tensors)
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/version", "3\n")
        for key, t in tensors.items():
            zf.writestr(f"archive/data/{key}", t.arr.tobytes())


# ---------------------------------------------------------------------------
# reference-style state dict built from our param template (inverse map)
# ---------------------------------------------------------------------------

def _ref_mlp(dst, prefix, tree, rng):
    dst[f"{prefix}.net.0.weight"] = tree["Dense_0"]["kernel"].T
    dst[f"{prefix}.net.0.bias"] = tree["Dense_0"]["bias"]
    dst[f"{prefix}.net.1.weight"] = tree["LayerNorm_0"]["scale"]
    dst[f"{prefix}.net.1.bias"] = tree["LayerNorm_0"]["bias"]
    dst[f"{prefix}.net.3.weight"] = tree["Dense_1"]["kernel"].T
    dst[f"{prefix}.net.3.bias"] = tree["Dense_1"]["bias"]


def _ref_linear(dst, prefix, tree):
    dst[f"{prefix}.weight"] = tree["kernel"].T
    if "bias" in tree:
        dst[f"{prefix}.bias"] = tree["bias"]


def _ref_node_update(dst, prefix, tree):
    for ours, theirs in (("hk", "hk_func"), ("hv", "hv_func"),
                         ("hq", "hq_func")):
        _ref_mlp(dst, f"{prefix}.{theirs}", tree[ours], None)
    if "node_output" in tree:
        _ref_mlp(dst, f"{prefix}.node_output", tree["node_output"], None)


def _ref_bond_update(dst, prefix, tree, hidden):
    """Inverse of the kv-kernel row re-blocking (dense triplet mode)."""
    H = hidden
    for ours, theirs in (("hk", "hk_func"), ("hv", "hv_func")):
        kj = tree[f"{ours}_kj"]["kernel"]         # [H+20+2H, H]
        ji = tree[f"{ours}_ji"]["kernel"]         # [20, H]
        ang = tree[f"{ours}_ang"]["kernel"]       # [13, H]
        w = np.concatenate([kj[:H + 20], ji, ang, kj[H + 20:]], axis=0)
        dst[f"{prefix}.{theirs}.net.0.weight"] = w.T
        dst[f"{prefix}.{theirs}.net.0.bias"] = tree[f"{ours}_kj"]["bias"]
        dst[f"{prefix}.{theirs}.net.1.weight"] = tree[f"{ours}_ln"]["scale"]
        dst[f"{prefix}.{theirs}.net.1.bias"] = tree[f"{ours}_ln"]["bias"]
        dst[f"{prefix}.{theirs}.net.3.weight"] = \
            tree[f"{ours}_out"]["kernel"].T
        dst[f"{prefix}.{theirs}.net.3.bias"] = tree[f"{ours}_out"]["bias"]
    _ref_mlp(dst, f"{prefix}.hq_func", tree["hq"], None)


def _build_reference_state(params, cfg):
    """Our randomly-initialized param tree -> reference-named state dict."""
    p = params["params"]
    H = cfg.model.hidden_dim
    dst = {}
    _ref_linear(dst, "node_embedder", p["node_embedder"])
    _ref_linear(dst, "edge_embedder", p["edge_embedder"])
    _ref_linear(dst, "phore_embedding", p["phore_embedding"])
    for name in ("v_inference", "atom_mlp", "atom_mlp_1", "bond_inference"):
        key0 = f"{name}_0"
        if key0 in p:
            _ref_linear(dst, f"{name}.0", p[key0])
            _ref_linear(dst, f"{name}.2", p[f"{name}_2"])
    if "phore_encoder" in p:
        _ref_node_update(dst, "phore_encoder", p["phore_encoder"])
    den = p["denoiser"]
    for i in range(cfg.model.denoiser.num_layers):
        lt = den[f"layer_{i}"]
        pre = f"denoiser.base_block.{i}"
        _ref_linear(dst, f"{pre}.lin_node", lt["lin_node"])
        _ref_node_update(dst, f"{pre}.node_layer_with_edge",
                         lt["node_layer_with_edge"])
        _ref_node_update(dst, f"{pre}.node_layer_with_bond",
                         lt["node_layer_with_bond"])
        _ref_bond_update(dst, f"{pre}.bond_layer", lt["bond_layer"], H)
        for side in ("pos_layer_with_edge", "pos_layer_with_bond"):
            for ours, theirs in (("xk", "xk_func"), ("xv", "xv_func"),
                                 ("xq", "xq_func")):
                _ref_mlp(dst, f"{pre}.{side}.{theirs}", lt[side][ours], None)
        if "dire_embedding" in lt:
            _ref_linear(dst, f"{pre}.dire_embedding", lt["dire_embedding"])
    if "edge_pred_layer" in den:
        _ref_mlp(dst, "denoiser.edge_pred_layer", den["edge_pred_layer"],
                 None)
    # buffer the importer must skip. Value matters for the golden replay
    # (torch load_state_dict OVERWRITES the module's buffer): the reference
    # builds this RBF with fix_offset=True (`GaussianSmearing(0., r_max,
    # num_gaussians=...)`, reference `models/uni_denoiser.py:323` +
    # `models/common.py:11-24`), i.e. the fixed non-uniform 20-point grid.
    from phoregen_tpu.ops.rbf import FIXED_RBF_OFFSETS
    dst["denoiser.distance_expansion.offset"] = np.asarray(
        FIXED_RBF_OFFSETS, np.float64)
    return dst


@pytest.fixture(scope="module")
def tiny_dense_setup():
    cfg = default_config("zinc_300")
    m = cfg.model
    m.hidden_dim = 16
    m.denoiser.hidden_dim = 16
    m.denoiser.num_layers = 2
    m.denoiser.n_heads = 2
    m.denoiser.knn = 4
    m.denoiser.triplet_mode = "dense"
    m.denoiser.scan_layers = False
    m.diff.num_timesteps = 8
    m.diff.time_dim = 2
    cfg.dataset.ligand_buckets = [16]
    cfg.dataset.max_phore = 16
    cfg.dataset.corpus = "chains"
    cfg.finalize()
    pg = PhoreGen(cfg)
    samples = synthetic_dataset(0, 2, max_atoms=12)
    batch = next(iter(PhoreDataLoader(samples, cfg, 2, shuffle=False)))
    params = pg.init_params(jax.random.PRNGKey(0), batch)
    return cfg, pg, batch, params


@pytest.mark.slow
def test_pt_roundtrip_and_forward(tiny_dense_setup, tmp_path):
    cfg, pg, batch, params = tiny_dense_setup
    host = jax.tree_util.tree_map(np.asarray, params)
    state = _build_reference_state(host, cfg)

    tensors = {}
    pkl_state = {}
    for i, (k, v) in enumerate(state.items()):
        t = _TensorObj(v, str(i))
        tensors[str(i)] = t
        pkl_state[k] = t
    ckpt = {"model": pkl_state, "epoch": 42}
    path = str(tmp_path / "ref.pt")
    write_torch_pt(path, ckpt, tensors)

    imported, meta = load_reference_checkpoint(path, cfg)
    assert meta.get("epoch") == 42

    # structural identity + numerical round-trip back to our tree
    flat_t, tdef = jax.tree_util.tree_flatten(host)
    flat_i, idef = jax.tree_util.tree_flatten(
        jax.tree_util.tree_map(np.asarray, imported))
    assert tdef == idef
    for a, b in zip(flat_t, flat_i):
        np.testing.assert_allclose(a, b, rtol=1e-6)

    # the imported params drive a full forward
    key = jax.random.PRNGKey(1)
    _, metrics = pg.compute_loss(
        jax.tree_util.tree_map(lambda x: jax.numpy.asarray(x), imported),
        key, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_pt_reader_handles_strides_and_scalars(tmp_path):
    arr = np.arange(24, dtype=np.float32).reshape(4, 6)
    t = _TensorObj(arr, "0")
    path = str(tmp_path / "x.pt")
    write_torch_pt(path, {"w": t}, {"0": t})
    out = read_torch_pt(path)
    np.testing.assert_array_equal(out["w"], arr)


def test_shape_mismatch_fails_loudly(tiny_dense_setup, tmp_path):
    cfg, pg, batch, params = tiny_dense_setup
    host = jax.tree_util.tree_map(np.asarray, params)
    state = _build_reference_state(host, cfg)
    # drop one tensor -> importer must raise, not silently fill
    bad = dict(state)
    bad.pop("denoiser.base_block.1.lin_node.weight")
    with pytest.raises((KeyError, ValueError)):
        map_reference_state(bad, cfg)


def test_factorized_mode_rejected(tiny_dense_setup):
    cfg, pg, batch, params = tiny_dense_setup
    import copy
    cfg2 = copy.deepcopy(cfg)
    cfg2.model.denoiser.triplet_mode = "factorized"
    with pytest.raises(ValueError, match="dense"):
        map_reference_state({}, cfg2)
