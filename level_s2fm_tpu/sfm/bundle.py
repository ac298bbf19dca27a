"""Neural bundle adjustment + rendering refine: host wrappers.

Orchestrates the jitted BAPhase/RefinePhase over scene state
(ref `pipelines/BA.py`, `pipelines/rendering_refine.py`). Local BA picks
the new camera + covisible views, global BA all views
(ref `BA.py:90-103`); poses and surface-projected points are written back
after the loop (ref `BA.py:182-186`).

Note: the reference's `Point3DSet.update_xyzs` is a no-op (lazy `map`
never executed, `Point3D.py:83-84` — flagged in SURVEY.md §2.1), so
upstream BA point updates are silently lost. We FIX this (points are
written back) as the evidently intended behavior; set
``opt.Ablate_config.replicate_update_xyzs_bug`` to reproduce the
reference bit-for-bit.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..geometry import transforms as T
from ..utils.hostdev import on_host_cpu
from . import entities, optstate
from .phases import BAPhase, PhaseCfgs, RefinePhase


#: Camera-count shape buckets: every distinct C used to compile a fresh
#: multi-minute phase program through the remote-TPU compiler (ROADMAP
#: "Camera count C is NOT bucketed"); padding C to ~2 buckets/octave caps
#: compiles at O(log C) while wasting <=33% of the camera axis. Padded
#: slots replicate camera 0 and are excluded from every loss via
#: ``cam_mask`` (see `phases.render_core`).
_CAM_BUCKETS = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128)


def cam_bucket(n: int) -> int:
    for b in _CAM_BUCKETS:
        if n <= b:
            return b
    return int(-(-n // 32) * 32)


def pad_cam_ids(cam_ids: Sequence[int]) -> tuple:
    """(padded id list, real count): padded slots repeat camera 0."""
    ids = list(cam_ids)
    C = len(ids)
    return ids + [ids[0]] * (cam_bucket(C) - C), C


def build_tracing_data(cfgs: PhaseCfgs, cameraset: entities.CameraSet,
                       pointset: entities.PointSet, cam_ids: Sequence[int],
                       n_real: Optional[int] = None):
    """Per-camera padded tracked-keypoint rays + target points for the
    multi-view tracing-consistency loss (ref `Camera.py:476-488`)."""
    C = len(cam_ids)
    per_cam = []
    for cid in cam_ids:
        cam = cameraset(cid)
        kidx = np.where(cam.idx2d_to_3d != -1)[0]
        per_cam.append((cam, kidx))
    Nt = entities.pad_to_bucket(max([len(k) for _, k in per_cam] + [1]))
    center = np.zeros((C, Nt, 3), np.float32)
    ray = np.zeros((C, Nt, 3), np.float32)
    ray[..., 2] = 1.0
    xyz = np.zeros((C, Nt, 3), np.float32)
    mask = np.zeros((C, Nt), bool)
    for i, (cam, kidx) in enumerate(per_cam):
        n = len(kidx)
        if n == 0:
            continue
        with on_host_cpu():  # eager per-camera ray setup stays off the tunnel
            c, r = T.get_center_and_ray(jnp.asarray(cam.pose())[None],
                                        jnp.asarray(cam.intr),
                                        jnp.asarray(cam.kypts[kidx], jnp.float32))
            center[i, :n] = np.asarray(c[0])
            ray[i, :n] = np.asarray(r[0])
        xyz[i, :n] = pointset.get_xyzs(cam.idx2d_to_3d[kidx])
        mask[i, :n] = n_real is None or i < n_real
    return {"center": jnp.asarray(center), "ray": jnp.asarray(ray),
            "xyz": jnp.asarray(xyz), "mask": jnp.asarray(mask)}


def run_phase_occ_refresh(opt, cfgs, phase, state, batch, key, n_iters,
                          segments: int = 4):
    """Run a phase in outer segments, rebuilding the occupancy grid from
    the CURRENT SDF between segments (the surface moves during a phase;
    the compaction band must follow it)."""
    seg = max(n_iters // segments, 1)
    done = 0
    metrics_parts = []
    i = 0
    import jax
    while done < n_iters:
        n = min(seg, n_iters - done)
        b = dict(batch)
        b["occ"] = maybe_build_occ(opt, cfgs, state["params"])
        state, m = phase.run(state, b, jax.random.fold_in(key, 1000 + i),
                             n_iters=n)
        metrics_parts.append(m)
        done += n
        i += 1
    import jax.numpy as _jnp
    metrics = jax.tree.map(lambda *xs: _jnp.concatenate(xs, axis=0),
                           *metrics_parts)
    return state, metrics


def maybe_build_occ(opt, cfgs: PhaseCfgs, params):
    """Occupancy grid for compacted rendering inside phases (opt-in via
    Renderer.compact_samples; grid rebuilt from the current SDF at each
    phase start/segment — see run_phase_occ_refresh)."""
    if cfgs.ren.compact_samples is None:
        return None
    from ..fields import sdf as sdf_mod
    from ..rendering import raymarch as rm
    res = int(opt.get("Renderer", {}).get("occ_res", 64))
    thr = float(opt.get("Renderer", {}).get("occ_threshold", 0.25))
    return rm.build_occupancy_grid(
        lambda p: sdf_mod.infer_sdf(params["sdf"], cfgs.sdf, p),
        jnp.asarray(cfgs.sdf.center, jnp.float32),
        jnp.asarray(cfgs.sdf.half_size, jnp.float32),
        resolution=res, threshold=thr, one_sided=True)


def stack_images(cameraset: entities.CameraSet, cam_ids: Sequence[int]):
    return jnp.asarray(np.stack(
        [cameraset(c).img.reshape(-1, 3) for c in cam_ids], 0))


class Bundler:
    """One BA invocation over picked cameras (ref `BA.py:23-108`)."""

    def __init__(self, opt, cfgs: PhaseCfgs, cameraset: entities.CameraSet,
                 pointset: entities.PointSet,
                 cam_pick_ids: Optional[List[int]] = None, mode: str = "sfm_refine"):
        self.opt = opt
        self.cfgs = cfgs
        self.cameraset = cameraset
        self.pointset = pointset
        self.local = cam_pick_ids is not None
        self.cam_pick_ids = list(cam_pick_ids) if cam_pick_ids is not None \
            else list(cameraset.cam_ids)
        self.mode = mode

        ob = opt.optim.ba
        max_iter = int(ob.max_iter)
        if cam_pick_ids is not None and len(cam_pick_ids) == 1:
            max_iter = max_iter // 2  # ref `BA.py:47-49`
        self.max_iter = max_iter

        pts_id, pose_idx, kypts = entities.gather_track_observations(
            cameraset, self.cam_pick_ids)
        self.pts_pick_ids = pts_id
        P = entities.pad_to_bucket(max(len(pts_id), 1))
        self.P = P
        xyzs = np.zeros((P, 3), np.float32)
        xyzs[:len(pts_id)] = pointset.get_xyzs(pts_id)
        kp = np.zeros((P, 2), np.float32)
        kp[:len(pts_id)] = kypts
        pidx = np.zeros(P, np.int32)
        pidx[:len(pts_id)] = pose_idx
        valid = np.zeros(P, bool)
        valid[:len(pts_id)] = True

        cam0 = cameraset(self.cam_pick_ids[0])
        # pad the camera axis to a shape bucket; real cams are the prefix
        self.padded_ids, self.C_real = pad_cam_ids(self.cam_pick_ids)
        self.batch = {
            "pose_idx": jnp.asarray(pidx), "kp": jnp.asarray(kp),
            "valid": jnp.asarray(valid),
            "intr": jnp.asarray(cam0.intr),
            "images": stack_images(cameraset, self.padded_ids),
            "grid": T.mesh_grid(cfgs.H, cfgs.W),
            "tracing": build_tracing_data(cfgs, cameraset, pointset,
                                          self.padded_ids, self.C_real),
            "cam_mask": jnp.arange(len(self.padded_ids)) < self.C_real,
        }
        self.xyzs0 = jnp.asarray(xyzs)

        weights = {k: v for k, v in opt.loss_weight.ba.items()}
        from .phases import get_cached_phase
        self.phase = get_cached_phase(
            BAPhase, cfgs, weights, mode=mode,
            single_cam=(len(self.cam_pick_ids) == 1),
            lr_sdf=float(ob.lr_sdf), lr_sdf_end=float(ob.lr_sdf_end),
            lr_color=float(ob.lr_color), lr_pose_r=float(ob.lr_pose_r),
            lr_pose_t=float(ob.lr_pose_t), max_iter=max_iter)

    def run(self, params, key, verbose=True) -> tuple:
        """Returns (params, reproj_px)."""
        se3 = self.cameraset.all_se3(self.padded_ids)
        ba_params = {"sdf": params["sdf"], "rad": params["rad"],
                     "se3_r": jnp.asarray(se3[:, :3]),
                     "se3_t": jnp.asarray(se3[:, 3:])}
        state = self.phase.init_state(ba_params, self.xyzs0)
        state["opt"] = optstate.adopt(f"ba_{self.mode}", state["opt"])
        # occupancy refresh only matters when the phase RENDERS
        # (mode != "sfm"); pure-reprojection BA has no occ consumer, and
        # the refresh costs 4 grid rebuilds + extra scan dispatches
        if self.cfgs.ren.compact_samples is not None and self.mode != "sfm":
            state, metrics = run_phase_occ_refresh(
                self.opt, self.cfgs, self.phase, state, self.batch, key,
                self.max_iter)
        else:
            state, metrics = self.phase.run(state, self.batch, key)
        optstate.record(f"ba_{self.mode}", state["opt"])
        p = state["params"]
        reproj = float(np.asarray(metrics["reproj_px"])[-1])
        if verbose:
            name = "local_ba" if self.local else "global_ba"
            last = {k: float(np.asarray(v)[-1]) for k, v in metrics.items()
                    if np.asarray(v).ndim == 1}
            print({"phase": name, **{k: round(v, 4) for k, v in last.items()}})
            print(f"reprojection error{reproj}")

        # write back poses (ref `BA.py:185-186`); np.array copies — an
        # np.asarray view of a jax array is READ-ONLY and would crash the
        # next in-place pose write (see entities.Camera.__post_init__)
        se3_new = np.array(jnp.concatenate([p["se3_r"], p["se3_t"]], axis=1))
        for j, cid in enumerate(self.cam_pick_ids):
            self.cameraset(cid).se3 = se3_new[j]
        # write back surface-projected points (see module docstring).
        # fetch_host: the carried xyzs are sharded over the global mesh;
        # on a multi-process run np.asarray would raise (non-addressable)
        if not self.opt.Ablate_config.get("replicate_update_xyzs_bug", False):
            from ..parallel.distributed import fetch_host
            xyzs_new = fetch_host(state["xyzs"])[:len(self.pts_pick_ids)]
            self.pointset.update_xyzs(self.pts_pick_ids, xyzs_new)
        new_params = {"sdf": p["sdf"], "rad": p["rad"]}
        return new_params, reproj


class Refiner:
    """Rendering refine: freeze poses, fit fields
    (ref `rendering_refine.py:16-121`)."""

    def __init__(self, opt, cfgs: PhaseCfgs, cameraset: entities.CameraSet,
                 pointset: entities.PointSet,
                 cam_pick_ids: Optional[List[int]] = None,
                 max_iter: Optional[int] = None):
        self.opt = opt
        self.cfgs = cfgs
        self.cameraset = cameraset
        self.cam_pick_ids = list(cam_pick_ids) if cam_pick_ids is not None \
            else list(cameraset.cam_ids)
        orf = opt.optim.refine
        padded_ids, C_real = pad_cam_ids(self.cam_pick_ids)
        poses, _ = cameraset.all_poses(padded_ids)
        cam0 = cameraset(self.cam_pick_ids[0])
        self.batch = {
            "poses": jnp.asarray(poses),
            "intr": jnp.asarray(cam0.intr),
            "images": stack_images(cameraset, padded_ids),
            "grid": T.mesh_grid(cfgs.H, cfgs.W),
            "tracing": build_tracing_data(cfgs, cameraset, pointset,
                                          padded_ids, C_real),
            "cam_mask": jnp.arange(len(padded_ids)) < C_real,
        }
        weights = {k: v for k, v in opt.loss_weight.refine.items()}
        from .phases import get_cached_phase
        self.phase = get_cached_phase(
            RefinePhase, cfgs, weights,
            lr_sdf=float(orf.lr_sdf), lr_sdf_end=float(orf.lr_sdf_end),
            lr_color=float(orf.lr_color),
            max_iter=int(max_iter or orf.max_iter))

    def run(self, params, key, verbose=True):
        state = self.phase.init_state(params)
        state["opt"] = optstate.adopt("refine", state["opt"])
        if self.cfgs.ren.compact_samples is not None:
            state, metrics = run_phase_occ_refresh(
                self.opt, self.cfgs, self.phase, state, self.batch, key,
                self.phase.max_iter)
        else:
            state, metrics = self.phase.run(state, self.batch, key)
        optstate.record("refine", state["opt"])
        if verbose:
            last = {k: float(np.asarray(v)[-1]) for k, v in metrics.items()
                    if np.asarray(v).ndim == 1}
            print({"phase": "refine", **{k: round(v, 4) for k, v in last.items()}})
        return state["params"]
