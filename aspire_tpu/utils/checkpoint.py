"""Topology-independent checkpoint restore.

Orbax saves jax.Array leaves with their device/sharding metadata; a
targetless `StandardCheckpointer().restore` then tries to rebuild the SAVED
topology and fails whenever the restoring process sees different devices --
e.g. a checkpoint written by a 2-host DCN training job (device ids 0-3 +
2048-2051) opened by a single-host serving or evaluation process.  The
reference never hits this because torch `state_dict`s are plain host
tensors (trainer.py:53-92); this helper restores the same way: every leaf
comes back as a host numpy array, ignoring saved device metadata, and the
caller places it (models replicate params onto their own mesh anyway).
"""
from __future__ import annotations

import numpy as np

import jax


def restore_params(path) -> dict:
    """Restore an orbax checkpoint as a pytree of HOST numpy arrays.

    Works regardless of the device topology the checkpoint was saved under
    (single chip, virtual CPU mesh, multi-host DCN job).  Use this for every
    params-only restore; full-TrainState resume keeps its abstract-target
    restore (train.trainer.restore_full_state) which already pins layouts.
    """
    import orbax.checkpoint as ocp

    path = str(path)
    ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    meta = ckptr.metadata(path).item_metadata
    tree = meta.tree if hasattr(meta, "tree") else meta
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    return ckptr.restore(path, args=ocp.args.PyTreeRestore(
        restore_args=restore_args))
