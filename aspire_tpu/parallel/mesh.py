"""Device-mesh helpers: single-controller SPMD over ICI.

Replaces the reference's torch.distributed/NCCL DDP stack
(src/learning/main_fsim.py:36-50, trainer.py:476-803): no process groups, no
per-rank data files, no explicit barriers.  A `Mesh` with a `data` axis (and
an optional `shard` axis for the corpus index) + sharded array arguments is
the whole distribution story; XLA inserts the gradient psums that DDP's
backward hooks perform, and collectives ride ICI.

Multi-host: call `jax.distributed.initialize()` before `make_mesh` and the
same code runs over DCN-connected slices unchanged.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(**kwargs) -> None:
    """Multi-host bring-up: call once per process before any device use.

    Thin wrapper over `jax.distributed.initialize` (coordinator address etc.
    via kwargs or TPU metadata).  After this, `make_mesh(devices=
    jax.devices())` spans all hosts; the same pjit programs run over
    DCN-connected slices unchanged -- no NCCL-style process-group plumbing.

    Replaces the reference's `setup_ddp` (`dist.init_process_group('nccl',
    rank, world_size)`, main_fsim.py:36-46) and the per-rank data-file
    splitting of run_main_fsim-ddp.sh: every process streams the SAME data
    and `shard_batch` places only the rows its devices own (see `_put`).
    Executed (not just compiled) by tests/test_multihost_dcn.py: two
    gRPC-connected processes train in lockstep and must match the
    single-process run.
    """
    jax.distributed.initialize(**kwargs)


def _put(x, sharding: NamedSharding):
    """Place host data under `sharding`, multi-process safe.

    Single process: plain `device_put`.  Multi-process (DCN): every process
    holds the FULL host value (all processes stream the same data, same
    seeds), and `make_array_from_process_local_data(global_shape=x.shape)`
    carves out just the shards owned by this process's addressable devices
    -- `device_put` cannot target non-addressable devices.  Replicated specs
    (P()) work the same way: each device maps to the full slice.
    """
    if jax.process_count() > 1:
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape=x.shape)
    return jax.device_put(x, sharding)


def place(x, mesh: Mesh, spec: P = P()):
    """Public multi-process-safe placement: host value -> global array under
    `spec` over `mesh`.  Single process it is a device_put; multi-process
    every process passes the same full host value (see `_put`).  Use for
    query batches / candidate-id matrices fed to sharded serving programs:
    jit would otherwise try to auto-place process-local arrays onto
    non-addressable devices and fail."""
    return _put(x, NamedSharding(mesh, spec))


def make_train_serve_mesh(n_data: int, n_shards: int, devices=None) -> Mesh:
    """2-D mesh ('data', 'shard') for colocated training + serving jobs."""
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= n_data * n_shards
    arr = np.asarray(devices[: n_data * n_shards]).reshape(n_data, n_shards)
    return Mesh(arr, ("data", "shard"))


def make_mesh(n_data: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `n_data` devices (default all)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is not None:
        # fail fast: silently truncating would run 'data-parallel' on fewer
        # devices than the caller sized their batch for
        assert len(devices) >= n_data, (
            f"requested {n_data} data-parallel devices, only "
            f"{len(devices)} available")
        devices = devices[:n_data]
    return Mesh(np.asarray(devices), ("data",))


def make_serving_mesh(n_shards: int | None = None, devices=None) -> Mesh:
    """1-D corpus-sharding mesh for index serving."""
    devices = list(devices if devices is not None else jax.devices())
    if n_shards is not None:
        assert len(devices) >= n_shards, (
            f"requested {n_shards} index shards, only {len(devices)} "
            f"devices available")
        devices = devices[:n_shards]
    return Mesh(np.asarray(devices), ("shard",))


def data_parallel_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the `data` mesh axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh: Mesh, axis: int = 0):
    """Shard every array in a batch pytree along `axis` over the data axis.

    axis=0 for flat [batch, ...] pytrees; axis=1 for grad-accumulation
    superbatches shaped [n_micro, micro_batch, ...].
    """
    spec = P(*([None] * axis + ["data"]))
    sh = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(lambda x: _put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: _put(x, sh), tree)
