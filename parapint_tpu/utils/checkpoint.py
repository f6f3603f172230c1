"""Checkpoint/resume for interior-point solves.

The reference has no checkpointing (SURVEY.md section 5.4); its nearest
feature is warm-starting duals from Ipopt suffix files
(/root/reference/parapint/interfaces/interface.py:262-282).  Here the whole
solver state is the :class:`IPState` pytree plus two scalars (barrier,
inertia coefficient), so checkpointing is exact and cheap: flatten the
pytree to arrays, store as .npz with the treedef recorded.

Use ``ip_solve(..., checkpoint_path=..., checkpoint_interval=k)`` for
automatic periodic checkpoints, or call save/load directly.
"""

import dataclasses
import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from parapint_tpu.interfaces.base import IPState


def save_checkpoint(
    path: str,
    state: IPState,
    barrier: float,
    inertia_coef: float,
    iteration: int,
) -> None:
    """Atomically write the solver state to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    meta = dict(
        barrier=float(barrier),
        inertia_coef=float(inertia_coef),
        iteration=int(iteration),
        treedef=str(treedef),
        shapes=[list(a.shape) for a in arrays.values()],
        n_leaves=len(leaves),
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, __meta__=json.dumps(meta), **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, like: IPState) -> Tuple[IPState, float, float, int]:
    """Load a checkpoint; ``like`` provides the pytree structure (e.g.
    ``interface.init_state()``).  Returns (state, barrier, inertia_coef,
    iteration).

    The stored treedef and leaf shapes are validated against ``like``: a
    checkpoint written for a different problem raises a clear ValueError
    instead of unflattening into garbage.
    """
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
        leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(meta["n_leaves"])]
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    if meta.get("treedef") is not None and meta["treedef"] != str(treedef):
        raise ValueError(
            f"checkpoint {path!r} was written for a different state structure:\n"
            f"  stored:   {meta['treedef']}\n  expected: {treedef}"
        )
    if len(leaves) != len(like_leaves):
        raise ValueError(
            f"checkpoint {path!r} holds {len(leaves)} leaves, expected "
            f"{len(like_leaves)}"
        )
    stored_shapes = [tuple(s) for s in meta.get("shapes", [])]
    like_shapes = [tuple(np.shape(l)) for l in like_leaves]
    if stored_shapes and stored_shapes != like_shapes:
        bad = [
            (i, s, e)
            for i, (s, e) in enumerate(zip(stored_shapes, like_shapes))
            if s != e
        ]
        raise ValueError(
            f"checkpoint {path!r} was written for a different problem size; "
            f"mismatched leaf shapes (index, stored, expected): {bad[:5]}"
        )
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, meta["barrier"], meta["inertia_coef"], meta["iteration"]
