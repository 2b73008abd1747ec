"""Device-mesh and sharding helpers: the TPU-native replacement for the
reference's DataParallel/DDP+NCCL layer (reference `run/run.py:73-76,160-256`).

Design (SURVEY.md §2.7): the model is ~M-parameter scale, so parameters,
optimizer state and EMA are *replicated*; the batch axis is sharded over a 1-D
`data` mesh riding ICI. Gradients are reduced implicitly by XLA (the loss is a
mean over the sharded batch axis, so sharded autodiff inserts the psum —
no NCCL-style explicit collectives needed). Multi-host input sharding slices
the global batch by `jax.process_index()`.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis_name: str = "data",
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    """1-D data-parallel mesh over local devices.

    num_devices == 0 means all available devices. For a single device this
    still returns a valid 1-element mesh so train/sample code paths are
    identical on 1 chip and N chips.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding for arrays whose leading axis is the batch axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place every leaf of a batch pytree with its leading axis sharded.

    Requires the global batch size to divide the mesh size; callers pad the
    batch (bucketed batching guarantees static shapes anyway).
    """
    sh = batch_sharding(mesh, axis_name)

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Commit every leaf of a pytree replicated over the mesh (done once at
    state creation so jitted steps see stable input shardings — avoids a
    recompile on the second step when outputs come back mesh-committed)."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def local_batch_slice(global_batch_size: int) -> slice:
    """This host's slice of the global batch (multi-host input sharding,
    the replacement for `DistributedSampler`, reference `run/run.py:248-252`).
    """
    n_proc = jax.process_count()
    assert global_batch_size % n_proc == 0, (
        f"global batch {global_batch_size} not divisible by process count "
        f"{n_proc}")
    per = global_batch_size // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
