"""Traditional-SfM ablation paths: DLT triangulation + reprojection-only BA.

Equivalents of the reference's ablation pipelines (SURVEY.md §2.1):
  * `pipelines/Initialization_Trad.py` — same pose bootstrap, but 3D
    points from DLT triangulation; the SDF is then fitted post-hoc to the
    triangulated cloud (tracing + sdf_surf + eikonal, ref `:161-183`).
  * `pipelines/Registration_Trad.py` — PnP with the SDF gate widened,
    DLT triangulation of new matches (ref `:216-261`).
  * `pipelines/BA_Trad.py` — classic bundle adjustment by gradient
    descent: free 3D point parameters + se(3) poses under a pure
    reprojection loss (ref `:106,163-168`).

Enabled by ``opt.Ablate_config.tri_trad`` / ``opt.Ablate_config.ba_trad``.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..fields import sdf as sdf_mod
from ..geometry import lie
from . import entities, hostgeom
from . import losses as L
from . import optim as optim_mod
from .phases import PhaseCfgs, project_points_per


# ============================================================================
# SDF post-fit to a triangulated point cloud
# ============================================================================

class SdfFitPhase:
    """Fit the SDF to fixed 3D points (ref `Initialization_Trad.py:161-183`).

    batch: center [1,N,3], ray [1,N,3] (rays through the triangulated
    keypoints), pts [M,3], pts_mask [M], kp_mask [N].
    Losses: tracing (traced surface vs pts), sdf_surf at pts, eikonal.
    """

    def __init__(self, cfgs: PhaseCfgs, lr_sdf=1e-3, lr_sdf_end=1e-4,
                 max_iter=200):
        self.cfgs = cfgs
        self.max_iter = max_iter
        gamma = optim_mod.decay_gamma(lr_sdf, lr_sdf_end, max_iter)
        self._mk_tx = lambda params: optim_mod.make_phase_optimizer(
            params, {"sdf": "sdf", "rad": "frozen"}, {"sdf": lr_sdf}, gamma)
        self._run = jax.jit(self._run_impl, static_argnames=("n_iters",))

    def init_state(self, params):
        self._tx = self._mk_tx(params)
        return {"params": params, "opt": self._tx.init(params)}

    def _losses(self, params, batch, key):
        cfgs = self.cfgs
        tr = sdf_mod.sphere_tracing(params["sdf"], cfgs.sdf, batch["center"],
                                    batch["ray"], key=key)
        tdist = L.safe_norm(batch["pts_at_rays"] - tr.pts_surface[0], axis=-1)
        tracing = L.masked_mean(tdist, batch["kp_mask"])
        sdf_p = sdf_mod.infer_sdf(params["sdf"], cfgs.sdf, batch["pts"])[..., 0]
        sdf_surf = L.masked_mean(jnp.abs(sdf_p), batch["pts_mask"])
        g = sdf_mod.gradient_chunked(params["sdf"], cfgs.sdf, tr.sample_pts)
        eik = L.l1(L.safe_norm(g, axis=-1), 1.0)
        return {"tracing_loss": tracing, "sdf_surf": sdf_surf,
                "eikonal_loss": eik}

    def _run_impl(self, state, batch, key, n_iters: int):
        weights = {"tracing_loss": 1, "sdf_surf": 2, "eikonal_loss": 2}

        def step(st, k):
            def total_fn(params):
                loss = self._losses(params, batch, k)
                return L.weighted_total(loss, weights), loss

            from .phases import guarded_update
            (total, loss), grads = jax.value_and_grad(total_fn, has_aux=True)(
                st["params"])
            params, opt, _ = guarded_update(self._tx, grads, st["opt"],
                                            st["params"])
            loss["all"] = total
            return {"params": params, "opt": opt}, loss

        keys = jax.random.split(key, n_iters)
        return jax.lax.scan(step, state, keys)

    def run(self, params, batch, key, n_iters=None):
        from .phases import chunked_run
        state = self.init_state(params)
        state, metrics = chunked_run(self._run, state, batch, key,
                                     n_iters or self.max_iter)
        return state["params"], metrics


def fit_sdf_to_points(opt, cfgs: PhaseCfgs, params, pts: np.ndarray,
                      center: np.ndarray, ray: np.ndarray, key,
                      max_iter: int = 200):
    """Host wrapper: pad + run SdfFitPhase.

    center/ray/pts are aligned per-keypoint arrays [n,3] (each ray's
    triangulated point is its tracing target).
    """
    n = center.shape[0]
    assert pts.shape[0] == n
    N = entities.pad_to_bucket(max(n, 1))
    c = np.zeros((1, N, 3), np.float32)
    r = np.zeros((1, N, 3), np.float32)
    r[..., 2] = 1.0
    p_at = np.zeros((N, 3), np.float32)
    c[0, :n], r[0, :n], p_at[:n] = center, ray, pts
    batch = {
        "center": jnp.asarray(c), "ray": jnp.asarray(r),
        "pts_at_rays": jnp.asarray(p_at),
        "kp_mask": jnp.asarray(np.arange(N) < n),
        "pts": jnp.asarray(p_at), "pts_mask": jnp.asarray(np.arange(N) < n),
    }
    phase = SdfFitPhase(cfgs, max_iter=max_iter)
    params, metrics = phase.run(params, batch, key)
    return params


# ============================================================================
# Traditional BA (free points, reprojection only)
# ============================================================================

class BATradPhase:
    """Classic gradient BA (ref `BA_Trad.py`): free xyzs + se3 poses,
    pure reprojection loss."""

    def __init__(self, cfgs: PhaseCfgs, lr_pose_r=5e-3, lr_pose_t=1e-2,
                 lr_xyzs=1e-2, lr_end_scale=0.5, max_iter=1000):
        self.cfgs = cfgs
        self.max_iter = max_iter
        gamma = lr_end_scale ** (1.0 / max_iter)
        self._mk_tx = lambda params: optim_mod.make_phase_optimizer(
            params, {"se3_r": "pose_r", "se3_t": "pose_t", "xyzs": "xyzs"},
            {"pose_r": lr_pose_r, "pose_t": lr_pose_t, "xyzs": lr_xyzs}, gamma)
        self._run = jax.jit(self._run_impl, static_argnames=("n_iters",))

    def _run_impl(self, state, batch, key, n_iters: int):
        def step(st, _):
            def total_fn(params):
                se3 = jnp.concatenate([params["se3_r"], params["se3_t"]], 1)
                poses = lie.se3_to_SE3(se3[batch["pose_idx"]])
                pts = params["xyzs"][batch["obs_to_pt"]]
                uv, _ = project_points_per(pts, poses, batch["intr"])
                r = L.safe_norm(uv - batch["kp"], axis=-1)
                ok = batch["valid"] & jnp.isfinite(r)
                loss = L.masked_mean(r, ok)
                return loss, loss

            from .phases import guarded_update
            (total, loss), grads = jax.value_and_grad(total_fn, has_aux=True)(
                st["params"])
            params, opt, _ = guarded_update(self._tx, grads, st["opt"],
                                            st["params"])
            return {"params": params, "opt": opt}, {"reproj_px": loss}

        return jax.lax.scan(step, state, jnp.arange(n_iters))

    def run(self, params, batch, key, n_iters=None):
        from .phases import chunked_run
        self._tx = self._mk_tx(params)
        state = {"params": params, "opt": self._tx.init(params)}
        state, metrics = chunked_run(self._run, state, batch, key,
                                     n_iters or self.max_iter)
        return state["params"], metrics


class TradBundler:
    """Host wrapper for BATradPhase over picked cameras
    (ref `BA_Trad.py:23-167`)."""

    def __init__(self, opt, cfgs: PhaseCfgs, cameraset: entities.CameraSet,
                 pointset: entities.PointSet,
                 cam_pick_ids: Optional[List[int]] = None):
        self.opt = opt
        self.cameraset = cameraset
        self.pointset = pointset
        self.cam_pick_ids = (list(cam_pick_ids) if cam_pick_ids is not None
                             else list(cameraset.cam_ids))
        self.local = cam_pick_ids is not None
        ob = opt.optim.ba
        max_iter = int(ob.max_iter)
        if cam_pick_ids is not None and len(cam_pick_ids) == 1:
            max_iter //= 2
        pts_id, pose_idx, kypts = entities.gather_track_observations(
            cameraset, self.cam_pick_ids)
        # unique points become free variables; observations index into them
        uniq, inv = np.unique(pts_id, return_inverse=True)
        self.uniq_pts = uniq
        P = entities.pad_to_bucket(max(len(pts_id), 1))
        U = entities.pad_to_bucket(max(len(uniq), 1))
        kp = np.zeros((P, 2), np.float32)
        kp[:len(pts_id)] = kypts
        pidx = np.zeros(P, np.int32)
        pidx[:len(pts_id)] = pose_idx
        oidx = np.zeros(P, np.int32)
        oidx[:len(pts_id)] = inv
        valid = np.zeros(P, bool)
        valid[:len(pts_id)] = True
        xyzs = np.zeros((U, 3), np.float32)
        xyzs[:len(uniq)] = pointset.get_xyzs(uniq)
        cam0 = cameraset(self.cam_pick_ids[0])
        self.batch = {"pose_idx": jnp.asarray(pidx), "kp": jnp.asarray(kp),
                      "valid": jnp.asarray(valid),
                      "obs_to_pt": jnp.asarray(oidx),
                      "intr": jnp.asarray(cam0.intr)}
        self.xyzs0 = xyzs
        self.phase = BATradPhase(cfgs, lr_pose_r=float(ob.lr_pose_r),
                                 lr_pose_t=float(ob.lr_pose_t),
                                 lr_xyzs=float(opt.optim.lr_xyzs),
                                 max_iter=max_iter)

    def run(self, params, key, verbose=True):
        se3 = self.cameraset.all_se3(self.cam_pick_ids)
        trad_params = {"se3_r": jnp.asarray(se3[:, :3]),
                       "se3_t": jnp.asarray(se3[:, 3:]),
                       "xyzs": jnp.asarray(self.xyzs0)}
        new_params, metrics = self.phase.run(trad_params, self.batch, key)
        reproj = float(np.asarray(metrics["reproj_px"])[-1])
        if verbose:
            name = "local_ba_trad" if self.local else "global_ba_trad"
            print({"phase": name, "reproj_px": round(reproj, 4)})
        se3_new = np.asarray(jnp.concatenate(
            [new_params["se3_r"], new_params["se3_t"]], axis=1))
        for j, cid in enumerate(self.cam_pick_ids):
            self.cameraset(cid).se3 = se3_new[j]
        self.pointset.update_xyzs(
            self.uniq_pts, np.asarray(new_params["xyzs"])[:len(self.uniq_pts)])
        return params, reproj


# ============================================================================
# Traditional triangulation helpers
# ============================================================================

def triangulate_pair_dlt(cam_a: entities.Camera, cam_b: entities.Camera,
                         kp_a: np.ndarray, kp_b: np.ndarray) -> np.ndarray:
    """DLT triangulation in world frame (ref `Initialization_Trad.py:91-99`)."""
    P_a = cam_a.intr @ cam_a.pose()
    P_b = cam_b.intr @ cam_b.pose()
    return hostgeom.triangulate_dlt(kp_a, kp_b, P_a, P_b)
