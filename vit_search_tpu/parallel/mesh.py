"""Device mesh and sharding helpers.

The reference's distributed runtime is NCCL process groups + DDP
(utils.py:241-307, main.py:366-370).  The TPU-native equivalent is a
``jax.sharding.Mesh`` with a data axis: parameters are replicated, batches
are sharded over ``'data'``, and XLA GSPMD inserts the gradient psum over
ICI — there is no hand-written collective in the training code.

Multi-host (multi-slice) runs initialize ``jax.distributed`` and shard the
global batch per process (replacing the reference's rank-sharded samplers,
samplers.py:39-57).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices: Optional[Sequence[jax.Device]] = None,
                axis_names: Sequence[str] = (DATA_AXIS,)) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices).reshape(len(devices)), axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Place host arrays with the batch axis sharded over the mesh.

    Single-host: plain ``device_put``.  Multi-host: each process holds only
    its own shard of the global batch (from the rank-sharded samplers), so
    global arrays are assembled with
    ``jax.make_array_from_process_local_data`` — ``device_put`` cannot
    build a global array from per-host shards.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a (host-identical) pytree across the mesh.

    On pods every process carries the same full value (params/EMA state),
    which is exactly the fully-replicated case
    ``make_array_from_process_local_data`` handles.
    """
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def prefetch_to_mesh(iterator, mesh: Mesh, depth: int = 2):
    """Yield device-resident batch-sharded pytrees, staying ``depth`` ahead.

    ``device_put`` is asynchronous, so enqueueing the next batches' host->
    device transfers before the current step is consumed overlaps input
    transfer with compute — the TPU equivalent of the reference's
    ``timm.data.PrefetchLoader`` CUDA-stream prefetch (datasets.py:144-184).
    """
    import collections

    buf = collections.deque()
    it = iter(iterator)

    def enqueue():
        try:
            buf.append(shard_batch(mesh, next(it)))
        except StopIteration:
            return False
        return True

    for _ in range(max(1, depth)):
        if not enqueue():
            break
    while buf:
        out = buf.popleft()
        enqueue()
        yield out


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (reference ``init_distributed_mode`` analogue).

    On single-host runs this is a no-op; on pods, JAX reads the cluster env
    (or the explicit arguments) and joins the coordination service — the
    DCN-level replacement for ``torch.distributed.init_process_group``
    (reference utils.py:285-306).
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0
