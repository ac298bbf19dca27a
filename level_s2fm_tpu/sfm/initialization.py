"""Two-view initialization: pose bootstrap + SDF/color fitting + triangulation.

Host orchestration of the reference `pipelines/Initialization.py`:
camera-0 pose on a sphere of radius rad_init (supp eq 16, ref `:52-78`),
relative pose by essential-matrix RANSAC (ref `:81-97`), then the jitted
InitPhase optimizes the fields for max_iter steps, and the final traced
surface points are filtered (3-sigma + SDF-convergence) into the PointSet
(ref `:185-217`).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import scene_opt
from ..geometry import lie, transforms as T
from ..utils.hostdev import on_host_cpu
from . import entities, hostgeom
from .phases import InitPhase, PhaseCfgs


def bootstrap_cam0_pose(opt) -> np.ndarray:
    """First camera on a sphere of radius rad_init (ref `:52-78`)."""
    rad = scene_opt(opt, "rad_init", opt.data.bound_max[0] / 2)
    if opt.data.get("inside", True):
        theta_y, theta_x = -np.pi / 4, 0.0
    else:
        theta_y, theta_x = np.pi / 4, np.pi / 2
    theta_z = np.pi / 4
    R_z = np.asarray(lie.angle_to_rotation_matrix(jnp.asarray([theta_z]), "Z"))[0]
    R_y = np.asarray(lie.angle_to_rotation_matrix(jnp.asarray([theta_y]), "Y"))[0]
    R_x = np.asarray(lie.angle_to_rotation_matrix(jnp.asarray([theta_x]), "X"))[0]
    w2c_rot = np.linalg.inv(R_x) @ np.linalg.inv(R_y) @ np.linalg.inv(R_z)
    t = w2c_rot @ np.asarray([
        -rad * np.cos(theta_y) * np.cos(theta_z),
        -rad * np.cos(theta_y) * np.sin(theta_z),
        -rad * np.sin(theta_y)], np.float64).reshape(3, 1)
    return np.concatenate([w2c_rot, t], axis=-1).astype(np.float32)


class Initializer:
    """Builds the two first Camera entities and runs the init phase."""

    def __init__(self, opt, cfgs: PhaseCfgs, cameraset: entities.CameraSet,
                 pointset: entities.PointSet, var: dict,
                 cam_info_reloaded: Optional[dict] = None):
        self.opt = opt
        self.cfgs = cfgs
        self.cameraset = cameraset
        self.pointset = pointset
        self.var = var

        id0, id1 = var["indx_init"]
        kp0_all, kp1_all = var["kypts_init"]
        matches0 = var["mchs_init"][0]          # match lists of cam0
        inliers0 = var["inliers_init"][0]
        rel_id = id1 if id1 < id0 else id1 - 1
        m = matches0[rel_id].astype(np.int64)
        inl = inliers0[rel_id].astype(bool)
        self.kp_idx0 = m[inl, 0]
        self.kp_idx1 = m[inl, 1]
        kp0 = np.asarray(kp0_all)[self.kp_idx0]
        kp1 = np.asarray(kp1_all)[self.kp_idx1]
        intr = np.asarray(var["intrs_init"][0], np.float32)

        if cam_info_reloaded is None:
            w2c0 = bootstrap_cam0_pose(opt)
            tv = hostgeom.estimate_essential(kp0, kp1, intr)
            if not tv.success:
                raise RuntimeError("two-view essential-matrix estimation failed")
            scale_init = scene_opt(opt, "scale_init", 1.0)
            rel = np.concatenate([tv.R, (tv.t * scale_init)[:, None]], axis=-1)
            with on_host_cpu():
                w2c1 = np.asarray(lie.pose_compose_pair(jnp.asarray(w2c0),
                                                        jnp.asarray(rel)))
                se3_0 = np.asarray(lie.SE3_to_se3(jnp.asarray(w2c0[None])))[0]
                se3_1 = np.asarray(lie.SE3_to_se3(jnp.asarray(w2c1[None])))[0]
            extr = [se3_0, se3_1]
            idx2d = [None, None]
        else:
            extr = [cam_info_reloaded["pose_para"][i] for i in range(2)]
            idx2d = [cam_info_reloaded["idx2d_to_3ds"][i] for i in range(2)]

        for i, cam_id in enumerate((id0, id1)):
            cam = entities.Camera(
                id=cam_id,
                img=np.asarray(var["imgs_init"][i], np.float32),
                intr=np.asarray(var["intrs_init"][i], np.float32),
                pose_gt=np.asarray(var["poses_gt"][cam_id], np.float32),
                kypts=np.asarray(var["kypts_init"][i], np.float32),
                matches=var["mchs_init"][i],
                inlier_masks=var["inliers_init"][i],
                se3=np.asarray(extr[i], np.float32),
                idx2d_to_3d=None if idx2d[i] is None else np.asarray(idx2d[i]))
            cameraset.add(cam)

        oi = opt.optim.init
        weights = {k: v for k, v in opt.loss_weight.init.items()}
        self.phase = InitPhase(cfgs, weights,
                               lr_sdf=float(oi.lr_sdf), lr_sdf_end=float(oi.lr_sdf_end),
                               lr_color=float(oi.lr_color), max_iter=int(oi.max_iter))
        self.batch = self._build_batch()

    def _build_batch(self) -> dict:
        cam0, cam1 = self.cameraset.cameras[0], self.cameraset.cameras[1]
        H, W = self.cfgs.H, self.cfgs.W
        kp0 = cam0.kypts[self.kp_idx0]
        kp1 = cam1.kypts[self.kp_idx1]
        n = kp0.shape[0]
        pad = entities.pad_to_bucket(n)
        intr_np = np.asarray(cam0.intr, np.float32)
        intr = jnp.asarray(intr_np)
        poses = jnp.asarray(np.stack([cam0.pose(), cam1.pose()], 0))

        def rays_for(pose, kps):
            with on_host_cpu():
                c, r = T.get_center_and_ray(jnp.asarray(pose)[None],
                                            jnp.asarray(intr_np),
                                            jnp.asarray(kps, jnp.float32))
                return np.asarray(c[0]), np.asarray(r[0])

        c0, r0 = rays_for(cam0.pose(), kp0)
        c1, r1 = rays_for(cam1.pose(), kp1)

        def padded(x, fill=0.0):
            out = np.full((pad, *x.shape[1:]), fill, x.dtype)
            out[:n] = x
            return out

        center_k = np.stack([padded(c0), padded(c1)], 0)
        ray_k = np.stack([padded(r0), padded(r1)], 0)
        # ray through zero direction on padding would produce NaNs in
        # tracing; give padded rows a benign ray
        ray_k[:, n:] = np.asarray([0.0, 0.0, 1.0])
        kp_src = np.stack([padded(kp1.astype(np.float32)),
                           padded(kp0.astype(np.float32))], 0)
        kp_mask = np.zeros((2, pad), bool)
        kp_mask[:, :n] = True
        images = np.stack([cam0.img.reshape(-1, 3), cam1.img.reshape(-1, 3)], 0)
        batch = {
            "center_k": jnp.asarray(center_k), "ray_k": jnp.asarray(ray_k),
            "proj_pose": jnp.asarray(np.stack([cam1.pose(), cam0.pose()], 0)),
            "kp_src": jnp.asarray(kp_src), "kp_mask": jnp.asarray(kp_mask),
            "poses": poses, "intr": intr,
            "images": jnp.asarray(images),
            "grid": T.mesh_grid(H, W),
        }
        self._n_kp = n
        return batch

    def run(self, params, key, verbose: bool = True):
        """Optimize fields, triangulate, seed the point set. Returns params."""
        if self.opt.Ablate_config.get("tri_trad", False):
            return self.run_trad(params, key, verbose=verbose)
        state = self.phase.init_state(params)
        from . import optstate
        state["opt"] = optstate.adopt("init", state["opt"])
        if self.cfgs.ren.compact_samples is not None:
            from .bundle import run_phase_occ_refresh
            state, metrics = run_phase_occ_refresh(
                self.opt, self.cfgs, self.phase, state, self.batch, key,
                self.phase.max_iter, segments=8)
        else:
            state, metrics = self.phase.run(state, self.batch, key)
        optstate.record("init", state["opt"])
        params = state["params"]
        if verbose:
            last = {k: float(np.asarray(v)[-1]) for k, v in metrics.items()
                    if np.asarray(v).ndim == 1}
            print({"phase": "init", **{k: round(v, 4) for k, v in last.items()}})

        pts_surface, finish = self.phase.triangulate(params, self.batch,
                                                     jax.random.fold_in(key, 1))
        self._triangulate_host(np.asarray(pts_surface), np.asarray(finish))
        if verbose:
            self._print_relpose_oracle()
        self.cameraset.eval_poses(verbose=verbose)
        self._metrics = metrics
        return params

    def _print_relpose_oracle(self):
        """In-loop oracle comparing the 5-point-algorithm relative pose and
        the learned relative pose against GT (ref `Initialization.py:221-248`
        essential_2view: '5 points algo rot_error' / 'our algo rot_error')."""
        try:
            from . import hostgeom
            cam0, cam1 = self.cameraset.cameras[0], self.cameraset.cameras[1]
            kp0 = cam0.kypts[self.kp_idx0]
            kp1 = cam1.kypts[self.kp_idx1]
            tv = hostgeom.estimate_essential(kp0, kp1,
                                             np.asarray(cam0.intr, np.float64))
            if not tv.success:
                return
            with on_host_cpu():
                rel_5pt = jnp.asarray(
                    np.concatenate([tv.R, tv.t[:, None]], -1), jnp.float32)
                rel_gt = lie.pose_compose_pair(
                    lie.pose_invert(jnp.asarray(cam0.pose_gt)),
                    jnp.asarray(cam1.pose_gt))
                rel_est = lie.pose_compose_pair(
                    lie.pose_invert(jnp.asarray(cam0.pose())),
                    jnp.asarray(cam1.pose()))
                for name, rel in (("5 points algo", rel_5pt),
                                  ("our algo", rel_est)):
                    r_err = float(np.rad2deg(np.asarray(
                        lie.rotation_distance(rel_gt[:3, :3], rel[:3, :3]))))
                    t_err = float(lie.translation_angle_deg(rel[:3, 3],
                                                            rel_gt[:3, 3]))
                    print(f"{name} rot_error:{r_err}")
                    print(f"{name} translation_error:{t_err}")
        except Exception as e:  # a diagnostic print must never kill a run
            print(f"relpose oracle skipped: {e}")

    def run_trad(self, params, key, verbose: bool = True):
        """tri_trad ablation: DLT triangulation, then SDF post-fit
        (ref `Initialization_Trad.py:91-99,161-183`)."""
        import jax
        from . import hostgeom
        from .trad import fit_sdf_to_points
        cam0, cam1 = self.cameraset.cameras[0], self.cameraset.cameras[1]
        kp0 = cam0.kypts[self.kp_idx0]
        kp1 = cam1.kypts[self.kp_idx1]
        P0 = cam0.intr @ cam0.pose()
        P1 = cam1.intr @ cam1.pose()
        X = hostgeom.triangulate_dlt(kp0, kp1, P0, P1)
        # cheirality + bounds filter
        Xc0 = X @ cam0.pose()[:, :3].T + cam0.pose()[:, 3]
        Xc1 = X @ cam1.pose()[:, :3].T + cam1.pose()[:, 3]
        bmax = np.asarray(self.opt.data.bound_max, np.float32)
        bmin = np.asarray(self.opt.data.bound_min, np.float32)
        mask = ((Xc0[:, 2] > 0) & (Xc1[:, 2] > 0)
                & np.all(X < bmax, -1) & np.all(X > bmin, -1))
        print(f"Triangulation ratio {mask.sum()}/{len(mask)}")
        kp_idx = np.stack([self.kp_idx0, self.kp_idx1], 0)[:, mask]
        tracks = [[(0, int(kp_idx[0, j])), (1, int(kp_idx[1, j]))]
                  for j in range(kp_idx.shape[1])]
        idx = self.pointset.add_points(X[mask], tracks)
        cam0.idx2d_to_3d[kp_idx[0]] = idx
        cam1.idx2d_to_3d[kp_idx[1]] = idx

        # SDF post-fit to the triangulated cloud
        c = np.asarray(self.batch["center_k"])[0, :self._n_kp][mask]
        r = np.asarray(self.batch["ray_k"])[0, :self._n_kp][mask]
        params = fit_sdf_to_points(self.opt, self.cfgs, params, X[mask], c, r,
                                   jax.random.fold_in(key, 3), max_iter=200)
        self.cameraset.eval_poses(verbose=verbose)
        return params

    def _triangulate_host(self, pts_surface, finish):
        """3-sigma + convergence filter, seed PointSet (ref `:185-217`)."""
        n = self._n_kp
        p0, p1 = pts_surface[0, :n], pts_surface[1, :n]
        f0, f1 = finish[0, :n], finish[1, :n]
        diff = np.linalg.norm(p0 - p1, axis=-1)
        pts_avg = (p0 + p1) / 2
        gate = diff < (diff.mean() + 3 * diff.std())
        if self.opt.Ablate_config.get("sdf_filter", True):
            mask = gate & (f0 | f1)
        else:
            mask = gate
        print(f"Triangulation ratio {mask.sum()}/{len(mask)}")
        self._dump_match_vis(mask)
        kp_idx = np.stack([self.kp_idx0, self.kp_idx1], 0)[:, mask]
        tracks = [[(0, int(kp_idx[0, j])), (1, int(kp_idx[1, j]))]
                  for j in range(kp_idx.shape[1])]
        idx = self.pointset.add_points(pts_avg[mask], tracks)
        self.cameraset.cameras[0].idx2d_to_3d[kp_idx[0]] = idx
        self.cameraset.cameras[1].idx2d_to_3d[kp_idx[1]] = idx

    def _dump_match_vis(self, mask):
        """Init match images: filtered-out + original pairs
        (ref `Initialization.py:196-206`)."""
        out = self.opt.get("output_path", None)
        if not out:
            return
        try:
            import os
            from ..utils import vis
            cam0, cam1 = self.cameraset.cameras[:2]
            kp0 = cam0.kypts[self.kp_idx0]
            kp1 = cam1.kypts[self.kp_idx1]
            save = os.path.join(out, "init_mch")
            if (~mask).sum() > 2:
                vis.draw_matches(cam0.img, cam1.img, kp0[~mask], kp1[~mask],
                                 os.path.join(save, f"{cam0.id}_{cam1.id}_filter.jpg"),
                                 vis_num=100)
            vis.draw_matches(cam0.img, cam1.img, kp0, kp1,
                             os.path.join(save, f"{cam0.id}_{cam1.id}_org.jpg"))
        except Exception:
            pass  # visualization must never kill a run
