"""SfM checkpointing: field params + camera/point host state.

Equivalent of the reference's custom sfm checkpoint
(`utils/util.py:198-259`): one file holding sdf/color params, per-camera
se3 + ids + idx2d_to_3d maps, and point xyzs + feature tracks. Arrays go
in an npz; host bookkeeping (tracks, ids) rides along pickled. `--resume`
reloads everything; `--load` warm-starts field weights only.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, Optional, Tuple

import jax
import numpy as np


def _flatten_params(params) -> Dict[str, np.ndarray]:
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in leaves:
        key = "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint_sfm(path: str, params, cameraset, pointset,
                        it: int = 0, extra: Optional[dict] = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    treedef = jax.tree_util.tree_structure(params)
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(params)]
    payload = {
        "it": it,
        "treedef": pickle.dumps(treedef),
        "leaves": leaves,
        "cam_info": cameraset.get_parameters(),
        "pts_info": pointset.get_parameters(),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def restore_checkpoint_sfm(path: str) -> Tuple[object, dict, dict, int]:
    """Returns (params, cam_info, pts_info, it)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    treedef = pickle.loads(payload["treedef"])
    import jax.numpy as jnp
    leaves = [jnp.asarray(x) for x in payload["leaves"]]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    return params, payload["cam_info"], payload["pts_info"], payload["it"]
