"""Checkpoint / resume for solver and controller state.

The reference has no checkpointing (SURVEY.md §5): its closest analogs are
warm-start toggles on some solver adapters and the ``isUpdated`` lazy flag.
Here the receding-horizon state — the ``WarmStart`` pytree, plus any result
pytree — is first-class savable state: pack/unpack to flat numpy ``.npz``
archives (host side, no extra deps), so a serving process can restart and
resume warm-started solving with bitwise-identical state.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_pytree(path: str, tree: Any, meta: Optional[Dict] = None) -> None:
    """Save any pytree of arrays to ``path`` (.npz).

    The tree structure is recorded via ``jax.tree_util.tree_structure`` repr
    plus leaf order; ``meta`` is an optional JSON-serializable dict (e.g.
    tick counter, solver options fingerprint).
    """
    flat, treedef = _flatten_with_paths(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(flat)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic on POSIX


def load_pytree(path: str, like: Any) -> Tuple[Any, Dict]:
    """Load a pytree saved by :func:`save_pytree`.

    ``like`` supplies the tree structure (a template pytree with the same
    shape of nesting, e.g. a cold-start ``WarmStart``); leaves are restored
    in flatten order and placed on the default device.  The stored tree
    structure and leaf shapes are validated against ``like`` — restoring
    with a mismatched template raises instead of silently reassigning
    leaves by flatten order.
    """
    with np.load(path) as data:
        flat_like, treedef = jax.tree_util.tree_flatten(like)
        saved_treedef = bytes(data["__treedef__"]).decode()
        if saved_treedef != str(treedef):
            raise ValueError(
                f"checkpoint tree structure mismatch:\n  saved: "
                f"{saved_treedef}\n  template: {treedef}")
        leaves = [jnp.asarray(data[f"leaf_{i}"])
                  for i in range(len(flat_like))]
        for i, (saved, tmpl) in enumerate(zip(leaves, flat_like)):
            tshape = getattr(tmpl, "shape", None)
            if tshape is not None and tuple(saved.shape) != tuple(tshape):
                raise ValueError(
                    f"checkpoint leaf {i} shape mismatch: saved "
                    f"{tuple(saved.shape)} vs template {tuple(tshape)}")
        meta = json.loads(bytes(data["__meta__"]).decode())
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


def save_warm_start(path: str, warm, tick: int = 0, **meta) -> None:
    """Persist a (possibly batched) ``WarmStart`` for restart-resume."""
    save_pytree(path, warm, {"tick": tick, **meta})


def load_warm_start(path: str, like) -> Tuple[Any, int]:
    warm, meta = load_pytree(path, like)
    return warm, int(meta.get("tick", 0))


def save_pytree_orbax(path: str, tree: Any) -> None:
    """Save a pytree with orbax (production checkpointing: async-capable,
    sharding-aware — the right backend for multi-host serving state).

    ``path`` must be an absolute directory path.
    """
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load_pytree_orbax(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_pytree_orbax`; ``like``
    supplies structure/shapes/dtypes (and shardings on multi-host)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target=like)
