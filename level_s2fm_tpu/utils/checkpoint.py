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


def _tree_paths(params):
    """[(json-able path, np.ndarray leaf)] for dict/list trees.

    Stores structure as data ('d'=dict key, 's'=sequence index) instead
    of a pickled treedef — a pickled treedef breaks the moment a module
    is renamed/refactored; paths survive."""
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        spec = []
        for p in path:
            if hasattr(p, "key"):
                spec.append(("d", p.key))
            elif hasattr(p, "idx"):
                spec.append(("s", p.idx))
            else:
                raise TypeError(f"unsupported tree path entry {p!r}")
        out.append((spec, np.asarray(leaf)))
    return out


def _tree_from_paths(entries):
    def container_for(kind):
        return {} if kind == "d" else []

    root = container_for(entries[0][0][0][0]) if entries else {}
    for spec, leaf in entries:
        cur = root
        for i, (kind, k) in enumerate(spec):
            last = i == len(spec) - 1
            if kind == "s":
                while len(cur) <= k:
                    cur.append(None)
            if last:
                cur[k] = leaf
            else:
                nxt_kind = spec[i + 1][0]
                if kind == "d":
                    if k not in cur or cur[k] is None:
                        cur[k] = container_for(nxt_kind)
                    cur = cur[k]
                else:
                    if cur[k] is None:
                        cur[k] = container_for(nxt_kind)
                    cur = cur[k]
    return root


def save_checkpoint_sfm(path: str, params, cameraset, pointset,
                        it: int = 0, extra: Optional[dict] = None):
    from .obs import HOST_TIMERS
    with HOST_TIMERS.track("host_checkpoint"):
        return _save_checkpoint_sfm(path, params, cameraset, pointset,
                                    it=it, extra=extra)


def _save_checkpoint_sfm(path, params, cameraset, pointset, it, extra):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "version": 2,
        "it": it,
        "param_paths": _tree_paths(params),
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
    import jax.numpy as jnp
    if payload.get("version", 1) >= 2:
        entries = [(spec, jnp.asarray(leaf))
                   for spec, leaf in payload["param_paths"]]
        params = _tree_from_paths(entries)
    else:  # round-1 format: pickled treedef + leaves
        treedef = pickle.loads(payload["treedef"])
        leaves = [jnp.asarray(x) for x in payload["leaves"]]
        params = jax.tree_util.tree_unflatten(treedef, leaves)
    return params, payload["cam_info"], payload["pts_info"], payload["it"]
