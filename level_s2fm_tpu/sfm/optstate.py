"""Most-recent phase optimizer state — checkpoint surface parity.

The reference persists model-level optimizer/scheduler state dicts in its
sfm checkpoint and reloads them on ``--resume`` (`utils/util.py:205-218`,
`:239-259`). The TPU rebuild's phases construct a fresh optax optimizer
per invocation (which is itself reference parity: every reference phase
object builds its own Adam, e.g. `pipelines/BA.py:66-74`), so the
equivalent surface here is:

- after every completed phase, the final optimizer state (the stacked
  Adam moments pytree, `sfm/optim.py::adam_stacked`) is recorded in a
  single most-recent slot (device arrays; no host copy on the hot path);
- ``save_checkpoint_sfm`` persists that slot (label + leaves) with the
  checkpoint;
- after a ``--resume``, the FIRST invocation of the same phase label
  adopts the saved moments instead of zero-initialized ones (one-shot,
  exactly like the reference's "restoring optim_..." pass at restore).

A non-resumed run is unaffected: the store is record-only until
:func:`load` arms consumption.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import numpy as np

#: single most-recent slot. Module-global like `hashgrid.TRACE_ROWS`;
#: assumes one pipeline per process (true for the CLI and the tests).
_slot = {"label": None, "state": None}
_armed = [False]


def record(label: str, opt_state) -> None:
    """Remember a completed phase's final optimizer state (device-side)."""
    _slot["label"] = label
    _slot["state"] = opt_state


def snapshot() -> Optional[Tuple[str, List[np.ndarray]]]:
    """(label, host leaves) of the most recent phase, for checkpointing."""
    if _slot["state"] is None:
        return None
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(_slot["state"])]
    return _slot["label"], leaves


def load(label: str, leaves: List[np.ndarray]) -> None:
    """Fill the slot from a checkpoint and arm one-shot adoption."""
    _slot["label"] = label
    _slot["state"] = list(leaves)   # flat leaves; treedef comes from `fresh`
    _armed[0] = True


def reset() -> None:
    _slot["label"] = None
    _slot["state"] = None
    _armed[0] = False


def adopt(label: str, fresh_state):
    """Return the restored optimizer state if armed for ``label`` and the
    leaf shapes/dtypes match ``fresh_state`` (= ``tx.init(params)``),
    else ``fresh_state``. One-shot: the first adoption (or mismatch)
    disarms, so later phases of the run cold-start as usual."""
    if not _armed[0] or _slot["label"] != label:
        return fresh_state
    _armed[0] = False
    saved = _slot["state"]
    flat, treedef = jax.tree_util.tree_flatten(fresh_state)
    if not isinstance(saved, list):     # recorded in-process, not from ckpt
        saved = jax.tree_util.tree_leaves(saved)
    if len(saved) != len(flat):
        return fresh_state
    import jax.numpy as jnp
    out = []
    for s, f in zip(saved, flat):
        s = np.asarray(s)
        fa = jnp.asarray(f)
        if tuple(s.shape) != tuple(fa.shape) or s.dtype != fa.dtype:
            return fresh_state
        out.append(jnp.asarray(s))
    return jax.tree_util.tree_unflatten(treedef, out)
