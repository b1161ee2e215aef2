"""Checkpointing and model packaging (orbax + msgpack).

Replaces the reference's tf.train.Checkpoint/CheckpointManager + SavedModel
export flow (`metrabs_tf/main.py:114-118,378-436`): orbax checkpoints for
train state with keep-2 retention and step-keyed restore, and a flax msgpack
artifact for inference packaging. Restore precedence mirrors the reference
(`main.py:393-408`): explicit load path > latest in checkpoint dir > initial
weights path.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import serialization


def make_checkpoint_manager(directory: str, keep: int = 2,
                            save_interval_steps: int = 2000) -> ocp.CheckpointManager:
    """keep=2 and the save period mirror `main.py:114-118`."""
    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep, save_interval_steps=save_interval_steps)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save_train_state(manager: ocp.CheckpointManager, step: int, state) -> None:
    manager.save(step, args=ocp.args.StandardSave(state))


def restore_train_state(
        directory_or_manager, abstract_state, *, load_path: Optional[str] = None,
        init_path: Optional[str] = None):
    """Restores with the reference's precedence. Returns (state, restored_step)
    or (None, 0) when nothing is found."""
    if load_path:
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(load_path), abstract_state), -1
    manager = (directory_or_manager
               if isinstance(directory_or_manager, ocp.CheckpointManager)
               else make_checkpoint_manager(directory_or_manager))
    latest = manager.latest_step()
    if latest is not None:
        state = manager.restore(latest, args=ocp.args.StandardRestore(abstract_state))
        return state, latest
    if init_path:
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(init_path), abstract_state), 0
    return None, 0


def export_model_msgpack(path: str, variables: Any, metadata: Optional[dict] = None):
    """Packages inference weights (+ JSON-able metadata) as flax msgpack —
    the analogue of the reference's SavedModel export artifact."""
    payload = {'variables': jax.tree_util.tree_map(np.asarray, variables)}
    if metadata is not None:
        payload['metadata'] = metadata
    with open(path, 'wb') as f:
        f.write(serialization.msgpack_serialize(payload))


def load_model_msgpack(path: str) -> dict:
    with open(path, 'rb') as f:
        return serialization.msgpack_restore(f.read())
