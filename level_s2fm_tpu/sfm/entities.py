"""Host-side SfM scene state: cameras, 3D points, feature tracks.

Re-design of the reference's Python-object entities
(`pipelines/Camera.py:33-620`, `pipelines/Point3D.py`) as
structure-of-arrays numpy state. Device work happens in jitted phase
steps (`sfm/phases.py`); these classes only hold/bookkeep host state and
assemble padded, static-shape batches (SURVEY.md §7.1 item 2).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..geometry import lie, transforms as T
from ..utils.hostdev import on_host_cpu

import jax.numpy as jnp


def pad_to_bucket(n: int, buckets=(64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384,
                                   32768, 65536, 131072)) -> int:
    """Round n up to a bucket size to bound jit recompiles."""
    for b in buckets:
        if n <= b:
            return b
    return int(2 ** np.ceil(np.log2(max(n, 1))))


@dataclasses.dataclass
class Camera:
    """Per-view host state (ref `pipelines/Camera.py:33-94`)."""
    id: int
    img: np.ndarray                  # [H,W,3] float32 in [0,1]
    intr: np.ndarray                 # [3,3]
    pose_gt: np.ndarray              # [3,4] w2c
    kypts: np.ndarray                # [K,2]
    matches: List[np.ndarray]        # per other image: [M_i,2] kypt-index pairs
    inlier_masks: List[np.ndarray]   # per other image: [M_i] bool
    se3: np.ndarray = None           # [6] learnable w2c pose (host copy)
    idx2d_to_3d: np.ndarray = None   # [K] int, -1 = untracked

    def __post_init__(self):
        # force-writable copies: callers hand in np.asarray(jax_array)
        # views, which numpy marks READ-ONLY — the first in-place write
        # (e.g. restore_geometry's rollback) would raise "assignment
        # destination is read-only" (crashed every resumed round-3
        # flagship attempt at the view-23 ba-guard rollback)
        if self.se3 is None:
            self.se3 = np.zeros(6, np.float32)
        else:
            self.se3 = np.array(self.se3, np.float32)
        if self.idx2d_to_3d is None:
            self.idx2d_to_3d = -np.ones(self.kypts.shape[0], np.int64)
        else:
            self.idx2d_to_3d = np.array(self.idx2d_to_3d, np.int64)

    def pose(self) -> np.ndarray:
        with on_host_cpu():  # tiny eager math; keep it off the TPU tunnel
            return np.asarray(
                lie.se3_to_SE3(jnp.asarray(self.se3[None], jnp.float32)))[0]

    def rel_index(self, other_id: int) -> int:
        """Index into matches/inlier_masks for the pair (self, other).

        The reference stores per-image match lists excluding the image
        itself (`pipelines/Camera.py:122-128`).
        """
        return other_id if other_id < self.id else other_id - 1

    def matched_kypt_ids(self, other_id: int) -> Tuple[np.ndarray, np.ndarray]:
        """Inlier keypoint index pairs (self_idx, other_idx) vs other view."""
        rel = self.rel_index(other_id)
        m = self.matches[rel].astype(np.int64)
        mask = self.inlier_masks[rel].astype(bool)
        return m[mask, 0], m[mask, 1]


class CameraSet:
    """Ordered collection keyed by dataset/colmap id
    (ref `pipelines/Camera.py:370-417`)."""

    def __init__(self):
        self.cameras: List[Camera] = []
        self.cam_ids: List[int] = []

    def __len__(self):
        return len(self.cameras)

    def add(self, cam: Camera):
        self.cam_ids.append(cam.id)
        self.cameras.append(cam)

    def __call__(self, cam_id: int) -> Camera:
        return self.cameras[self.cam_ids.index(cam_id)]

    def index_of(self, cam_id: int) -> int:
        return self.cam_ids.index(cam_id)

    def all_se3(self, pick_ids: Optional[Sequence[int]] = None) -> np.ndarray:
        cams = self.cameras if pick_ids is None else [self(i) for i in pick_ids]
        return np.stack([c.se3 for c in cams], 0)

    def all_poses(self, pick_ids: Optional[Sequence[int]] = None):
        cams = self.cameras if pick_ids is None else [self(i) for i in pick_ids]
        poses = np.stack([c.pose() for c in cams], 0)
        poses_gt = np.stack([c.pose_gt for c in cams], 0)
        return poses, poses_gt

    def eval_poses(self, pick_ids: Optional[Sequence[int]] = None, verbose=True):
        """Procrustes-aligned rot/t errors + ATE; 2-view relative fallback
        (ref `pipelines/Camera.py:583-620`)."""
        from ..utils.obs import HOST_TIMERS
        with HOST_TIMERS.track("host_eval_poses"):
            return self._eval_poses_impl(pick_ids, verbose)

    def _eval_poses_impl(self, pick_ids, verbose):
        poses, poses_gt = self.all_poses(pick_ids)
        # diagnose non-finite poses instead of silently propagating NaN
        # into the Procrustes alignment and the metrics row (the round-3
        # flagship's committed summary ended in an unexplained nan row)
        finite_rows = np.isfinite(poses).all(axis=(1, 2))
        if not finite_rows.all():
            ids = self.cam_ids if pick_ids is None else list(pick_ids)
            bad = [ids[i] for i in np.where(~finite_rows)[0]]
            print(f"WARNING: eval_poses: non-finite pose(s) for cam ids "
                  f"{bad} — pose metrics are nan this step")
            return float("nan"), float("nan"), float("nan")
        with on_host_cpu():  # eager eval math stays off the TPU tunnel
            poses_j, gt_j = jnp.asarray(poses), jnp.asarray(poses_gt)
            if poses.shape[0] > 2:
                try:
                    aligned, _ = T.prealign_cameras(poses_j, gt_j)
                    if not bool(jnp.all(jnp.isfinite(aligned))):
                        print("WARNING: eval_poses: Procrustes alignment "
                              "returned non-finite sim3 (degenerate camera "
                              "layout?); falling back to unaligned poses")
                        aligned = poses_j
                except Exception as e:
                    print(f"WARNING: eval_poses: Procrustes alignment failed "
                          f"({e}); falling back to unaligned poses")
                    aligned = poses_j
                R_err, t_err, ate = T.evaluate_camera_alignment(
                    lie.pose_invert(aligned), lie.pose_invert(gt_j))
                r_deg = float(np.rad2deg(np.asarray(R_err).mean()))
                t_e = float(np.asarray(t_err).mean())
                ate = float(ate)
            else:
                rel_gt = lie.pose_compose_pair(lie.pose_invert(gt_j[0]), gt_j[1])
                rel_est = lie.pose_compose_pair(lie.pose_invert(poses_j[0]),
                                                poses_j[1])
                t_e = float(lie.translation_angle_deg(rel_est[:3, 3],
                                                      rel_gt[:3, 3]))
                r_deg = float(np.rad2deg(np.asarray(
                    lie.rotation_distance(rel_gt[:3, :3], rel_est[:3, :3]))))
                ate = float("nan")
        if verbose:
            print(f"rot_error:{r_deg}")
            print(f"t_error:{t_e}")
        return r_deg, t_e, ate

    def get_parameters(self) -> Dict:
        """Checkpointable camera state (ref `Camera.py:550-563`)."""
        return {
            "pose_para": self.all_se3(),
            "cam_id": list(self.cam_ids),
            "idx2d_to_3ds": [c.idx2d_to_3d.copy() for c in self.cameras],
        }


class PointSet:
    """Append-only 3D point store with feature tracks
    (ref `pipelines/Point3D.py:46-94`), backed by a growable array."""

    def __init__(self, capacity: int = 4096):
        self.xyz = np.zeros((capacity, 3), np.float32)
        self.n = 0
        self.tracks: List[List[Tuple[int, int]]] = []

    def __len__(self):
        return self.n

    def _grow(self, need: int):
        while self.n + need > self.xyz.shape[0]:
            self.xyz = np.concatenate([self.xyz, np.zeros_like(self.xyz)], 0)

    def add_points(self, xyzs: np.ndarray, tracks: List[List[Tuple[int, int]]]) -> np.ndarray:
        """Append [M,3] points; returns their indices."""
        m = xyzs.shape[0]
        self._grow(m)
        idx = np.arange(self.n, self.n + m)
        self.xyz[self.n:self.n + m] = xyzs
        self.tracks.extend([list(t) for t in tracks])
        self.n += m
        return idx

    def get_xyzs(self, idxs) -> np.ndarray:
        return self.xyz[np.asarray(idxs, np.int64)]

    def all_xyzs(self) -> np.ndarray:
        return self.xyz[:self.n]

    def update_xyzs(self, idxs, xyzs_new: np.ndarray):
        self.xyz[np.asarray(idxs, np.int64)] = xyzs_new

    def update_feat_tracks(self, idxs, new_entries: List[Tuple[int, int]]):
        for i, e in zip(idxs, new_entries):
            self.tracks[int(i)].append(tuple(e))

    def remove_observation(self, pid: int, cam_pos: int, kypt_idx: int):
        """Drop one (camera_position, keypoint) entry from a track."""
        t = self.tracks[int(pid)]
        try:
            t.remove((int(cam_pos), int(kypt_idx)))
        except ValueError:
            pass

    def alive_mask(self) -> np.ndarray:
        """Points still referenced by at least one track entry."""
        return np.asarray([len(t) > 0 for t in self.tracks], bool)

    def get_parameters(self) -> Dict:
        return {"xyzs": self.all_xyzs().copy(),
                "feat_tracks": [list(t) for t in self.tracks]}


def prune_outlier_observations(cameraset: CameraSet, pointset: PointSet,
                               thr_px: float, min_track: int = 2,
                               max_cam_frac: float = 0.25):
    """Drop observations whose post-BA reprojection exceeds ``thr_px``
    (or that fall behind the image plane), then retire points whose track
    shrinks below ``min_track`` by freeing their remaining keypoints.

    Deviation (beyond reference): the reference keeps every triangulated
    observation forever, so a handful of junk matches admitted at
    registration time set a reprojection floor BA cannot remove — its
    global-BA loop (`pipelines/LevelS2fM.py:404-418`) then exits on the
    5-cycle cap instead of the <1.0 px gate (measured: reproj crept
    0.57 -> 1.07 px over views 9-12 of the 32-view flagship run while
    rot error stayed at 0.3-0.6 deg). Freed keypoints flip back to
    idx2d_to_3d == -1 and are re-triangulatable by later geoinit passes,
    exactly like never-tracked keypoints. Returns
    (n_observations_removed, n_points_retired).

    Guard: a camera whose *fraction* of over-gate observations exceeds
    ``max_cam_frac`` is skipped — when most of a view's reprojections
    are bad, the pose (a transiently-diverged BA state) is the suspect,
    not the matches; pruning there would mass-delete good observations
    (measured: a diverged local-BA cycle on the 32-view flagship would
    have wiped 1313 observations in one pass).
    """
    n_removed = 0
    for ci, cam in enumerate(cameraset.cameras):
        kidx = np.where(cam.idx2d_to_3d != -1)[0]
        if len(kidx) == 0:
            continue
        pts = pointset.get_xyzs(cam.idx2d_to_3d[kidx])
        pose = cam.pose()
        Xc = pts @ pose[:, :3].T + pose[:, 3]
        uvw = Xc @ cam.intr.T
        z = uvw[:, 2]
        uv = uvw[:, :2] / np.clip(z[:, None], 1e-6, None)
        err = np.linalg.norm(uv - cam.kypts[kidx], axis=-1)
        bad = (err > thr_px) | (z <= 1e-6)
        if bad.mean() > max_cam_frac and len(kidx) >= 8:
            continue
        for k in kidx[bad]:
            pid = int(cam.idx2d_to_3d[k])
            cam.idx2d_to_3d[k] = -1
            pointset.remove_observation(pid, ci, int(k))
            n_removed += 1
    n_retired = 0
    for pid, track in enumerate(pointset.tracks):
        if 0 < len(track) < min_track:
            for ci, k in list(track):
                if cameraset.cameras[ci].idx2d_to_3d[k] == pid:
                    cameraset.cameras[ci].idx2d_to_3d[k] = -1
            track.clear()
            n_retired += 1
    return n_removed, n_retired


def mean_reprojection_px(cameraset: CameraSet, pointset: PointSet,
                         cam_ids: Optional[Sequence[int]] = None) -> float:
    """Host-side mean reprojection error over tracked observations of
    ``cam_ids`` (all cameras when None). Same projection math as
    `prune_outlier_observations`; used by the BA divergence guard to
    compare pre/post-cycle error on one consistent observation set."""
    cams = (cameraset.cameras if cam_ids is None
            else [cameraset(i) for i in cam_ids])
    errs = []
    for cam in cams:
        kidx = np.where(cam.idx2d_to_3d != -1)[0]
        if len(kidx) == 0:
            continue
        pts = pointset.get_xyzs(cam.idx2d_to_3d[kidx])
        pose = cam.pose()
        Xc = pts @ pose[:, :3].T + pose[:, 3]
        uvw = Xc @ cam.intr.T
        uv = uvw[:, :2] / np.clip(uvw[:, 2:3], 1e-6, None)
        errs.append(np.linalg.norm(uv - cam.kypts[kidx], axis=-1))
    if not errs:
        return float("nan")
    return float(np.concatenate(errs).mean())


def snapshot_geometry(cameraset: CameraSet, pointset: PointSet):
    """Cheap rollback point for one BA cycle: camera se3 + point xyz are
    mutable numpy (copied); field params are immutable jax arrays (the
    caller just keeps its old pytree reference)."""
    return ([c.se3.copy() for c in cameraset.cameras],
            pointset.xyz[:pointset.n].copy())


def restore_geometry(cameraset: CameraSet, pointset: PointSet, snap):
    se3s, xyz = snap
    for c, s in zip(cameraset.cameras, se3s):
        # rebind (not in-place): c.se3 may be a read-only numpy view of a
        # jax array if a write-back site slipped a non-copy through
        c.se3 = np.array(s, np.float32)
    pointset.xyz[:len(xyz)] = xyz


def gather_track_observations(cameraset: CameraSet, cam_ids: Sequence[int]):
    """Covisible (point_idx, pose_idx, kypt2d) triplets for BA
    (ref `utils/util.py:450-464`)."""
    pts_id, pose_idx, kypts = [], [], []
    for local_i, cid in enumerate(cam_ids):
        cam = cameraset(cid)
        mask = cam.idx2d_to_3d != -1
        cnt = int(mask.sum())
        pts_id.append(cam.idx2d_to_3d[mask])
        pose_idx.append(np.full(cnt, local_i, np.int64))
        kypts.append(cam.kypts[mask])
    if len(pts_id) == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros((0, 2), np.float32))
    return (np.concatenate(pts_id), np.concatenate(pose_idx),
            np.concatenate(kypts).astype(np.float32))
