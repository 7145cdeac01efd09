"""Checkpoint / resume for long-running chains and filters.

The reference persists chain state as line-delimited JSON plus raw Java
object serialization with a custom classloader (Streaming.scala:200-241).
Here checkpoints are msgpack-free ``np.savez`` archives of pytree leaves +
a JSON treedef descriptor: bit-exact resume of (params pytree, ll, PRNG key,
accepted count, iteration), no pickling, no classloader games.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_state(state: Dict[str, Any]):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    """Save a pytree-of-arrays state dict atomically.

    ``state`` may contain parameter trees, PRNG keys (pass key data via
    ``jax.random.key_data`` or raw uint32 keys), scalars and arrays.
    """
    leaves, treedef = _flatten_state(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    # human-readable structure record (restore uses an explicit template)
    with open(path + ".tree", "w") as f:
        f.write(str(treedef))


def restore_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into the structure of ``template`` (same keys/pytree shape).

    Using a template (rather than unpickling a treedef) keeps restore safe
    and explicit; shapes and dtypes are validated leaf-by-leaf.
    """
    data = np.load(path)
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    leaves = []
    for i, lt in enumerate(leaves_t):
        arr = data[f"leaf_{i}"]
        want = np.shape(lt)
        if tuple(arr.shape) != tuple(want):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != template {want}")
        want_dtype = np.result_type(lt)
        if arr.dtype != want_dtype:
            raise ValueError(
                f"checkpoint leaf {i} dtype {arr.dtype} != template "
                f"{want_dtype}")
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def checkpoint_exists(path: str) -> bool:
    return os.path.exists(path)
