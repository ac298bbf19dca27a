"""SfM checkpointing: field params + camera/point host state + optimizer.

Equivalent of the reference's custom sfm checkpoint
(`utils/util.py:198-259`): one file holding sdf/color params, per-camera
se3 + ids + idx2d_to_3d maps, point xyzs + feature tracks, and — like the
reference's "restoring optim_..." pass (`util.py:205-218`) — the most
recent phase optimizer state (see `sfm/optstate.py`). `--resume` reloads
everything; `--load` warm-starts field weights only.

Container (version 3, round 5): a single ``.npz`` (zip of raw arrays)
plus a JSON manifest entry — loadable with ``allow_pickle=False``, so
restoring a checkpoint never executes pickled code (the reference's
`torch.load` and our earlier pickle container both did). Versions 1/2
(pickle) remain readable for pre-round-5 checkpoints only.
"""
from __future__ import annotations

import io
import json
import os
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np


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
    arrays: Dict[str, np.ndarray] = {}
    specs = []
    for i, (spec, leaf) in enumerate(_tree_paths(params)):
        arrays[f"param_{i}"] = leaf
        specs.append(spec)

    cam_info = cameraset.get_parameters()
    cam_ids = list(cam_info["cam_id"])
    arrays["pose_para"] = np.asarray(cam_info["pose_para"], np.float32)
    arrays["cam_id"] = np.asarray(cam_ids, np.int64)
    for k, m in enumerate(cam_info["idx2d_to_3ds"]):
        arrays[f"idx2d_{k}"] = np.asarray(m)

    pts_info = pointset.get_parameters()
    tracks = pts_info["feat_tracks"]
    ptr = np.zeros(len(tracks) + 1, np.int64)
    flat: List[Tuple[int, int]] = []
    for i, t in enumerate(tracks):
        ptr[i + 1] = ptr[i] + len(t)
        flat.extend((int(a), int(b)) for a, b in t)
    arrays["xyzs"] = np.asarray(pts_info["xyzs"], np.float32)
    arrays["track_ptr"] = ptr
    arrays["track_data"] = (np.asarray(flat, np.int64).reshape(-1, 2)
                            if flat else np.zeros((0, 2), np.int64))

    manifest = {"version": 3, "it": int(it), "extra": extra or {},
                "param_specs": specs, "n_cams": len(cam_ids), "optim": None}

    # most recent phase optimizer state (moments survive a --resume)
    from ..sfm import optstate
    snap = optstate.snapshot()
    if snap is not None:
        label, leaves = snap
        for i, leaf in enumerate(leaves):
            arrays[f"optim_{i}"] = leaf
        manifest["optim"] = {"label": label, "n_leaves": len(leaves)}

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:        # file handle: savez must not append .npz
        np.savez(f, manifest=np.asarray(json.dumps(manifest)), **arrays)
    os.replace(tmp, path)


def restore_checkpoint_sfm(path: str) -> Tuple[object, dict, dict, int]:
    """Returns (params, cam_info, pts_info, it). Side effect: if the
    checkpoint carries a phase optimizer state, it is loaded into
    `sfm/optstate` and armed for one-shot adoption (the reference's
    "restoring optim_..." behavior, `util.py:205-218`)."""
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic[:2] == b"PK":
        return _restore_npz(path)
    return _restore_legacy_pickle(path)


def _restore_npz(path):
    import jax.numpy as jnp
    with np.load(path, allow_pickle=False) as z:
        manifest = json.loads(str(z["manifest"]))
        specs = [[(kind, k) for kind, k in spec]
                 for spec in manifest["param_specs"]]
        entries = [(spec, jnp.asarray(z[f"param_{i}"]))
                   for i, spec in enumerate(specs)]
        params = _tree_from_paths(entries)
        cam_info = {
            "pose_para": np.asarray(z["pose_para"]),
            "cam_id": [int(c) for c in z["cam_id"]],
            "idx2d_to_3ds": [np.asarray(z[f"idx2d_{k}"])
                             for k in range(manifest["n_cams"])],
        }
        ptr = np.asarray(z["track_ptr"])
        data = np.asarray(z["track_data"])
        tracks = [[(int(a), int(b)) for a, b in data[ptr[i]:ptr[i + 1]]]
                  for i in range(len(ptr) - 1)]
        pts_info = {"xyzs": np.asarray(z["xyzs"]), "feat_tracks": tracks}
        if manifest.get("optim"):
            from ..sfm import optstate
            o = manifest["optim"]
            optstate.load(o["label"],
                          [np.asarray(z[f"optim_{i}"])
                           for i in range(o["n_leaves"])])
    return params, cam_info, pts_info, manifest["it"]


def _restore_legacy_pickle(path):
    """Versions 1/2 (pre-round-5): pickle container. Kept ONLY so runs
    checkpointed by earlier rounds stay resumable; new saves are always
    npz. pickle.load executes code embedded in the file — never point
    this at an untrusted checkpoint."""
    import pickle
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
