"""Device mesh and sharding helpers — the framework's parallelism layer.

Parity target: the reference's only distribution strategy is single-process
``nn.DataParallel`` over local GPUs (trainer.py:255-265) with implicit
replicate/scatter/gather.  The TPU-native equivalent is a 1-D
``jax.sharding.Mesh`` with a ``data`` axis: parameters are replicated,
batches are sharded on the leading axis, and XLA inserts the gradient
all-reduce over ICI automatically inside the jitted train step.  G/D/CLIP
total well under 1B parameters, so pure DP is the right strategy at every
practical scale; the mesh API below nevertheless accepts extra axes so a
model-parallel dimension can be layered in without touching call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the given (default: all) devices.

    With the default single axis, all devices line up on ``data``.
    ``shape`` reshapes the device list for multi-axis meshes.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def make_mesh_for_batch(batch_size: int,
                        devices: Optional[Sequence] = None) -> Mesh:
    """Data mesh using the largest device count that divides the batch.

    The reference's DataParallel silently handles uneven splits; on TPU we
    keep shapes static by shrinking the mesh instead (a batch of 4 on an
    8-device host uses 4 devices)."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(devices[:n])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Device-put every array in ``tree`` with its batch dim sharded."""
    sharding = batch_sharded(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    """Device-put every array in ``tree`` fully replicated."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def global_batch(mesh: Mesh, tree, axis: str = "data"):
    """Assemble each process's LOCAL batch slice into a GLOBAL jax.Array
    sharded on the batch dimension.

    The multi-host generalization of :func:`shard_batch`: on a single
    process the two are identical (the host holds the whole batch and
    ``device_put`` scatters it); across processes each host holds only its
    ``DataLoader`` slice (``host_index``/``host_count``) and
    ``jax.make_array_from_process_local_data`` stitches the slices into one
    global array addressable by the jitted step — the global batch is
    ``local_batch * process_count``.  The reference has no multi-host
    story at all (single-process ``nn.DataParallel``, trainer.py:255-265);
    this is the TPU-pod equivalent.

    Host slice order matches device order: the loader hands host ``i`` the
    ``i``-th contiguous slab of the epoch permutation, and ``jax.devices()``
    orders devices by process index, so sample -> device placement is the
    identity layout ``PartitionSpec(axis)`` expects.
    """
    sharding = batch_sharded(mesh, axis)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), tree)


def emulated_global_batch(mesh: Mesh, local_slices: Sequence,
                          axis: str = "data"):
    """Single-process emulation of :func:`global_batch`'s multi-host path.

    ``local_slices`` is a list of H per-"host" pytrees (host ``i``'s slice
    of the global batch, as the ``DataLoader`` with ``host_index=i,
    host_count=H`` would produce).  Each slice is split across that host's
    contiguous block of mesh devices and the shards are stitched with
    ``jax.make_array_from_single_device_arrays`` — exactly what
    ``make_array_from_process_local_data`` does on a real pod, with the
    shard list restricted to addressable devices.  Used by the multichip
    dryrun and tests to validate the multi-host assembly without multiple
    processes; the result must be indistinguishable from
    :func:`shard_batch` of the concatenated batch.
    """
    sharding = batch_sharded(mesh, axis)
    devs = list(mesh.devices.reshape(-1))
    n_hosts = len(local_slices)
    if len(devs) % n_hosts:
        raise ValueError(f"{len(devs)} devices not divisible by "
                         f"{n_hosts} emulated hosts")
    per_host = len(devs) // n_hosts

    def put(*locals_):
        global_shape = ((sum(x.shape[0] for x in locals_),)
                        + tuple(locals_[0].shape[1:]))
        shards = []
        for h, local in enumerate(locals_):
            pieces = np.split(np.asarray(local), per_host, axis=0)
            for d, piece in enumerate(pieces):
                shards.append(jax.device_put(piece, devs[h * per_host + d]))
        return jax.make_array_from_single_device_arrays(
            global_shape, sharding, shards)

    return jax.tree.map(put, *local_slices)
