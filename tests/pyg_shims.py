"""Pure-torch shims for the PyG/torch_scatter/torch_sparse APIs the
reference PhoreGen uses, so its model code can run in this image (plain
CPU torch, no compiled PyG extensions) for golden-pack replay.

Faithful to the semantics the reference actually exercises:
- `torch_scatter.scatter_softmax/scatter_sum/scatter` over dim 0 (incl. the
  count head's `dim=-2` on 2-D inputs) — reference
  `models/uni_denoiser.py:50,54`, `models/diffusion.py:148-155`,
  `models/common.py:301-303`.
- `torch_geometric.nn.knn_graph` (batch-aware, no self loops,
  flow='source_to_target': edge_index = [neighbors/sources, centers]) —
  reference `models/uni_denoiser.py:351-361`, `models/common.py:300-303`.
- `torch_sparse.SparseTensor` with exactly the surface used by the bond
  triplet enumeration (CSR-sorted storage, row-select, set_value(None)
  row-count sum) — reference `models/uni_denoiser.py:101-121`.
- `torch_geometric.utils.remove_self_loops`.

`install(reference_path)` inserts these into sys.modules, PRELOADS the
reference modules the parity tests use, then REMOVES the import-only
rdkit/openbabel/lmdb/tensorboardX stand-ins again: the preloaded reference
modules keep their references, while the rest of the test session (e.g.
the pipeline tests' real HAVE_RDKIT detection) sees a clean sys.modules.
Test harness only — not part of the framework.
"""
from __future__ import annotations

import os
import sys
import types

import torch

__all__ = ["install"]


# --------------------------------------------------------------------------
# torch_scatter
# --------------------------------------------------------------------------

def _norm_dim(src, dim):
    dim = dim % src.dim()
    if dim != 0:
        raise NotImplementedError(f"scatter shim: dim {dim} (src {src.shape})")
    return dim


def _dim_size(index, dim_size):
    if dim_size is not None:
        return dim_size
    return int(index.max().item()) + 1 if index.numel() else 0


def scatter_sum(src, index, dim=0, dim_size=None):
    _norm_dim(src, dim)
    n = _dim_size(index, dim_size)
    out = src.new_zeros((n,) + src.shape[1:])
    out.index_add_(0, index, src)
    return out


def scatter_mean(src, index, dim=0, dim_size=None):
    _norm_dim(src, dim)
    n = _dim_size(index, dim_size)
    s = scatter_sum(src, index, 0, n)
    cnt = torch.zeros(n, dtype=src.dtype, device=src.device)
    cnt.index_add_(0, index, torch.ones_like(index, dtype=src.dtype))
    cnt = cnt.clamp(min=1).reshape((n,) + (1,) * (src.dim() - 1))
    return s / cnt


def scatter(src, index, dim=0, dim_size=None, reduce="sum"):
    if reduce in ("sum", "add"):
        return scatter_sum(src, index, dim, dim_size)
    if reduce == "mean":
        return scatter_mean(src, index, dim, dim_size)
    raise NotImplementedError(f"scatter shim: reduce={reduce!r}")


def scatter_softmax(src, index, dim=0, dim_size=None):
    _norm_dim(src, dim)
    n = _dim_size(index, dim_size)
    neg_inf = torch.finfo(src.dtype).min
    mx = src.new_full((n,) + src.shape[1:], neg_inf)
    mx.index_reduce_(0, index, src, "amax", include_self=True)
    ex = torch.exp(src - mx.index_select(0, index))
    denom = src.new_zeros((n,) + src.shape[1:])
    denom.index_add_(0, index, ex)
    return ex / denom.index_select(0, index).clamp(min=1e-38)


# --------------------------------------------------------------------------
# torch_geometric.nn.knn_graph
# --------------------------------------------------------------------------

def knn_graph(x, k, batch=None, loop=False, flow="source_to_target"):
    if batch is None:
        batch = torch.zeros(x.shape[0], dtype=torch.long, device=x.device)
    n = x.shape[0]
    d = torch.cdist(x, x)
    inf = torch.finfo(d.dtype).max
    d = d.masked_fill(batch.unsqueeze(1) != batch.unsqueeze(0), inf)
    if not loop:
        d = d.masked_fill(torch.eye(n, dtype=torch.bool, device=x.device),
                          inf)
    kk = min(k, max(n - 1, 1))
    vals, nbr = torch.topk(d, kk, dim=1, largest=False)      # [N, kk]
    valid = vals < inf                                       # graphs < k+1
    centers = torch.arange(n, device=x.device).unsqueeze(1).expand(-1, kk)
    src = nbr[valid]
    dst = centers[valid]
    if flow == "source_to_target":
        return torch.stack([src, dst])
    return torch.stack([dst, src])


def _unused(*a, **k):
    raise NotImplementedError("pyg shim: not exercised by the replay")


# --------------------------------------------------------------------------
# torch_sparse.SparseTensor (triplet-enumeration surface only)
# --------------------------------------------------------------------------

class _Storage:
    def __init__(self, row, col, value):
        self._row, self._col, self._value = row, col, value

    def row(self):
        return self._row

    def col(self):
        return self._col

    def value(self):
        return self._value


class SparseTensor:
    def __init__(self, row=None, col=None, value=None, sparse_sizes=None,
                 _sorted=False):
        if not _sorted:
            # CSR order: sort by (row, col) — coordinates are unique in the
            # directed edge sets this shim serves
            key = row * sparse_sizes[1] + col
            order = torch.argsort(key)
            row, col = row[order], col[order]
            value = value[order] if value is not None else None
        self._row, self._col, self._value = row, col, value
        self._sizes = sparse_sizes

    @property
    def storage(self):
        return _Storage(self._row, self._col, self._value)

    def __getitem__(self, idx):
        """Row-select (index_select on dim 0) with local row re-numbering."""
        counts = torch.bincount(self._row, minlength=self._sizes[0])
        ptr = torch.cat([counts.new_zeros(1), counts.cumsum(0)])
        lengths = counts[idx]
        total = int(lengths.sum().item())
        new_row = torch.arange(len(idx), device=idx.device
                               ).repeat_interleave(lengths)
        offs = lengths.cumsum(0) - lengths                    # per-sel start
        pos = (torch.arange(total, device=idx.device)
               - offs.repeat_interleave(lengths)
               + ptr[idx].repeat_interleave(lengths))
        return SparseTensor(
            row=new_row, col=self._col[pos],
            value=self._value[pos] if self._value is not None else None,
            sparse_sizes=(len(idx), self._sizes[1]), _sorted=True)

    def set_value(self, value):
        assert value is None, "shim supports set_value(None) only"
        return SparseTensor(row=self._row, col=self._col, value=None,
                            sparse_sizes=self._sizes, _sorted=True)

    def sum(self, dim):
        assert dim == 1
        assert self._value is None, "sum(dim=1) used after set_value(None)"
        return torch.bincount(self._row, minlength=self._sizes[0])


# --------------------------------------------------------------------------
# torch_geometric.utils
# --------------------------------------------------------------------------

def remove_self_loops(edge_index, edge_attr=None):
    mask = edge_index[0] != edge_index[1]
    ei = edge_index[:, mask]
    return ei, (edge_attr[mask] if edge_attr is not None else None)


# --------------------------------------------------------------------------
# sys.modules installation
# --------------------------------------------------------------------------

def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


# reference modules preloaded inside the toolkit-fake window; everything a
# parity test imports lazily must be (a dependency of) one of these
_REFERENCE_PRELOAD = (
    "models.diffusion",        # pulls common/transition/uni_denoiser/
                               # sample_utils/predict_bonds
    "utils.training_utils",    # pulls datasets.transform/phoregen
    "datasets.get_phore_data",
    "models.model_utils",      # EMA + writers (rdkit import at module level)
)


def _have_real(name):
    import importlib.util
    try:
        return importlib.util.find_spec(name) is not None
    except (ImportError, ValueError):
        return False


def install(reference_path="/root/reference"):
    """Install shims + preload the reference. Returns EasyDict; idempotent.

    If the REAL compiled packages are installed (a full PyG environment),
    they are left alone — the reference then runs on its native stack and
    the parity comparison is even stronger."""
    if not _have_real("torch_scatter"):
        _mod("torch_scatter", scatter=scatter, scatter_sum=scatter_sum,
             scatter_mean=scatter_mean, scatter_softmax=scatter_softmax)
    if not _have_real("torch_sparse"):
        _mod("torch_sparse", SparseTensor=SparseTensor)

    if _have_real("torch_geometric"):
        tg = None
    else:
        tg = _mod("torch_geometric")
    nn_mod = _mod("torch_geometric.nn", knn_graph=knn_graph,
                  radius_graph=_unused, radius=_unused,
                  knn=_unused) if tg is not None else None
    utils_mod = _mod("torch_geometric.utils",
                     remove_self_loops=remove_self_loops,
                     k_hop_subgraph=_unused, subgraph=_unused,
                     to_undirected=_unused, coalesce=_unused,
                     to_dense_adj=_unused, dense_to_sparse=_unused,
                     add_self_loops=_unused, sort_edge_index=_unused
                     ) if tg is not None else None

    class _NotExercised:
        def __init__(self, *a, **k):
            raise NotImplementedError("pyg shim: not exercised")

    data_mod = _mod("torch_geometric.data", Batch=_NotExercised,
                    Data=_NotExercised, Dataset=object, HeteroData=object
                    ) if tg is not None else None

    class Compose:
        def __init__(self, transforms):
            self.transforms = list(transforms)

        def __call__(self, data):
            for t in self.transforms:
                data = t(data)
            return data

    if tg is not None:
        tf_mod = _mod("torch_geometric.transforms", Compose=Compose)
        loader_mod = _mod("torch_geometric.loader",
                          DataLoader=_NotExercised,
                          DataListLoader=_NotExercised)
        tg.nn, tg.utils, tg.data = nn_mod, utils_mod, data_mod
        tg.transforms, tg.loader = tf_mod, loader_mod

    # easydict (reference configs are EasyDicts)
    class EasyDict(dict):
        def __init__(self, d=None, **kw):
            super().__init__()
            d = dict(d or {}, **kw)
            for k, v in d.items():
                self[k] = v

        def __setitem__(self, k, v):
            if isinstance(v, dict) and not isinstance(v, EasyDict):
                v = EasyDict(v)
            super().__setitem__(k, v)
            super().__setattr__(k, v)

        __setattr__ = __setitem__

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    # misc import-only deps of the reference's dataset modules
    fresh_misc = []
    if "lmdb" not in sys.modules:
        _mod("lmdb", open=_unused, Environment=_NotExercised)
        fresh_misc.append("lmdb")
    if "tensorboardX" not in sys.modules:
        _mod("tensorboardX", SummaryWriter=_NotExercised)
        fresh_misc.append("tensorboardX")

    if "easydict" not in sys.modules:
        _mod("easydict", EasyDict=EasyDict)

    # import-only rdkit/openbabel stand-ins (utils/sample_utils.py imports
    # them at module level and builds dicts from constants like
    # Chem.BondType.SINGLE; the replayed code paths never call them).
    # Memoizing attribute trees make any constant chain resolve to a stable
    # hashable sentinel; calling one raises.
    class _AttrNode:
        def __init__(self, name):
            object.__setattr__(self, "_name", name)
            object.__setattr__(self, "_children", {})

        def __getattr__(self, k):
            if k.startswith("__"):
                raise AttributeError(k)
            ch = object.__getattribute__(self, "_children")
            if k not in ch:
                nm = object.__getattribute__(self, "_name")
                ch[k] = _AttrNode(f"{nm}.{k}")
            return ch[k]

        def __call__(self, *a, **kw):
            # module-level constant-building calls (e.g.
            # Chem.GetPeriodicTable()) succeed and yield another sentinel;
            # replayed code paths never consume toolkit VALUES, and if one
            # ever did, the numeric comparison downstream fails loudly
            return getattr(self, "call_result")

    def _sentinel_module(name):
        m = types.ModuleType(name)
        root = _AttrNode(name)
        m.__getattr__ = lambda k: getattr(root, k)
        sys.modules[name] = m
        return m

    fresh_rdkit = "rdkit" not in sys.modules
    if fresh_rdkit:
        rdkit = _mod("rdkit")
        rdkit.Chem = _sentinel_module("rdkit.Chem")
        sys.modules["rdkit.Chem"].AllChem = _sentinel_module(
            "rdkit.Chem.AllChem")
        sys.modules["rdkit.Chem.AllChem"] = sys.modules["rdkit.Chem"].AllChem
        rdkit.Geometry = _sentinel_module("rdkit.Geometry")
        rdkit.RDLogger = _sentinel_module("rdkit.RDLogger")
        sys.modules["rdkit.RDLogger"] = rdkit.RDLogger
    installed_toolkits = []
    if "openbabel" not in sys.modules:
        ob_pkg = _mod("openbabel")
        ob_pkg.openbabel = _sentinel_module("openbabel.openbabel")
        installed_toolkits += ["openbabel", "openbabel.openbabel"]
    if fresh_rdkit:
        installed_toolkits += ["rdkit", "rdkit.Chem", "rdkit.Chem.AllChem",
                               "rdkit.RDLogger", "rdkit.Geometry"]
    if fresh_misc:
        installed_toolkits += fresh_misc

    # preload the reference inside the fake-toolkit window, then purge the
    # fakes so the rest of the process sees a clean sys.modules
    import importlib
    if reference_path and os.path.isdir(os.path.join(reference_path,
                                                     "models")):
        if reference_path not in sys.path:
            sys.path.insert(0, reference_path)
        try:
            for name in _REFERENCE_PRELOAD:
                importlib.import_module(name)
        finally:
            for name in installed_toolkits:
                sys.modules.pop(name, None)
    else:
        for name in installed_toolkits:
            sys.modules.pop(name, None)
    return EasyDict
