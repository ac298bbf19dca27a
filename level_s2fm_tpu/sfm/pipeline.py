"""Incremental SfM orchestrator — the engine state machine.

TPU-native equivalent of the reference `pipelines/LevelS2fM.py:92-455`:
two-view init, then per view: NBV selection (colmap order or PnP scoring),
PnP registration, SDF triangulation, sfm_refine -> local BA -> global BA
cycles with the reference's reprojection gates (2.5 px / 1.0 px, cycle
caps 1/5/5), rendering refine, checkpoint. Unlike the reference (which
IndexErrors off the end of the pose graph, ref `:238-245`), the loop
terminates cleanly when all views are registered.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from ..fields import radiance as radf
from ..fields import sdf as sdf_mod
from ..rendering import renderer as ren_mod
from ..utils import checkpoint as ckpt_mod
from ..utils.obs import Log, MetricRecorder, PhaseTimers
from . import entities
from .bundle import Bundler, Refiner
from .initialization import Initializer
from .phases import PhaseCfgs
from .registration import Registration


class LevelSfM:
    """Top-level model/engine (ref `pipelines/LevelS2fM.py:32-90` +
    `pipelines/base.py:21-53`)."""

    def __init__(self, opt, seed: int = 0):
        self.opt = opt
        self.sdf_cfg = sdf_mod.config_from_opt(opt)
        self.rad_cfg = radf.config_from_opt(opt)
        self.ren_cfg = ren_mod.config_from_opt(opt)
        H, W = opt.data.image_size
        dcw = opt.data.get("unfinish_dc", None)
        dataset = opt.data.get("dataset", None)
        in_list = dataset in ["TanksAndTemple", "BlendedMVS", "scannet", "DTU",
                              "llff", "ETH3D", "ETH3D_sp", None, "synthetic"]
        self.cfgs = PhaseCfgs(sdf=self.sdf_cfg, rad=self.rad_cfg, ren=self.ren_cfg,
                              H=H, W=W,
                              rand_rays=int(opt.Renderer.rand_rays),
                              dc_unfinish_weight=None if in_list else dcw)
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        self.params = {"sdf": sdf_mod.init_params(k1, self.sdf_cfg),
                       "rad": radf.init_params(k2, self.rad_cfg)}
        self.key = jax.random.PRNGKey(seed + 1)
        self.camera_set = entities.CameraSet()
        self.point_set = entities.PointSet()
        self.var: Optional[Dict] = None
        self.it = 0
        self.cam_info_reloaded = None
        self.pts_info_reloaded = None
        out = opt.get("output_path", None)
        self.metrics = MetricRecorder(
            os.path.join(out, "metrics.jsonl") if out else None,
            tb_dir=(os.path.join(out, "tb") if out and opt.get("tb", False)
                    else None))
        self.timers = PhaseTimers()

    # ------------------------------------------------------------ data/ckpt
    def load_data(self, var: Dict):
        """var: kypts, matches, masks, poses_gt, images, intrs, pose_graph."""
        self.var = var

    def next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def ckpt_path(self, numbered: Optional[int] = None) -> str:
        out = self.opt.get("output_path", "output/run")
        if numbered is None:
            return os.path.join(out, "model.ckpt")
        return os.path.join(out, f"model_{numbered}.ckpt")

    def save_checkpoint(self, latest=True):
        ckpt_mod.save_checkpoint_sfm(self.ckpt_path(), self.params,
                                     self.camera_set, self.point_set, it=self.it)
        if not latest:
            ckpt_mod.save_checkpoint_sfm(self.ckpt_path(self.it), self.params,
                                         self.camera_set, self.point_set, it=self.it)

    def restore_checkpoint(self, path: Optional[str] = None):
        path = path or self.ckpt_path()
        params, cam_info, pts_info, it = ckpt_mod.restore_checkpoint_sfm(path)
        self.params = params
        self.cam_info_reloaded = cam_info
        self.pts_info_reloaded = pts_info
        self.it = it

    def _reload_scene(self):
        """Rebuild CameraSet/PointSet from a restored checkpoint
        (ref `LevelS2fM.py:117-206`)."""
        var = self.var
        xyzs = self.pts_info_reloaded["xyzs"]
        tracks = self.pts_info_reloaded["feat_tracks"]
        self.point_set.add_points(np.asarray(xyzs), tracks)
        info = self.cam_info_reloaded
        for k, cam_id in enumerate(info["cam_id"]):
            cam = entities.Camera(
                id=int(cam_id),
                img=np.asarray(var["images"][cam_id], np.float32),
                intr=np.asarray(var["intrs"][cam_id], np.float32),
                pose_gt=np.asarray(var["poses_gt"][cam_id], np.float32),
                kypts=np.asarray(var["kypts"][cam_id], np.float32),
                matches=var["matches"][cam_id],
                inlier_masks=var["masks"][cam_id],
                se3=np.asarray(info["pose_para"][k], np.float32),
                idx2d_to_3d=np.asarray(info["idx2d_to_3ds"][k]))
            self.camera_set.add(cam)

    def _make_camera(self, cam_id: int) -> entities.Camera:
        var = self.var
        return entities.Camera(
            id=cam_id,
            img=np.asarray(var["images"][cam_id], np.float32),
            intr=np.asarray(var["intrs"][cam_id], np.float32),
            pose_gt=np.asarray(var["poses_gt"][cam_id], np.float32),
            kypts=np.asarray(var["kypts"][cam_id], np.float32),
            matches=var["matches"][cam_id],
            inlier_masks=var["masks"][cam_id])

    # ------------------------------------------------------------ phases
    def initialize_two_views(self, id0: int, id1: int, verbose=True):
        var = self.var
        init_var = {
            "indx_init": [id0, id1],
            "imgs_init": [var["images"][id0], var["images"][id1]],
            "kypts_init": [var["kypts"][id0], var["kypts"][id1]],
            "intrs_init": [var["intrs"][id0], var["intrs"][id1]],
            "mchs_init": [var["matches"][id0], var["matches"][id1]],
            "inliers_init": [var["masks"][id0], var["masks"][id1]],
            "poses_gt": var["poses_gt"],
        }
        init = Initializer(self.opt, self.cfgs, self.camera_set, self.point_set,
                           init_var, cam_info_reloaded=self.cam_info_reloaded)
        if self.cam_info_reloaded is None:
            self.params = init.run(self.params, self.next_key(), verbose=verbose)

    def select_next_view(self, pose_graph_left, verbose=True) -> int:
        """NBV: colmap order, or PnP inlier scoring (ref `LevelS2fM.py:243-282`).

        ``if_nbv=False`` is deliberate parity: the reference also scores
        candidates with ``nbv_if = False`` (`LevelS2fM.py:115,268`), so a
        candidate with <100 raw pairs short-circuits to (False, 0, n)
        exactly as upstream. Deviation (perf): candidates are scored by
        `registration.score_candidates` — identical scores, but one
        batched SDF dispatch for all candidates instead of the
        reference's per-candidate full-PnP loop."""
        if self.opt.get("nbv_mode", "colmap") == "colmap":
            return pose_graph_left[0]
        # batched scoring: one covisibility sweep + ONE bucketed SDF
        # dispatch across all candidates (vs the reference's per-candidate
        # full-PnP loop) — keeps NBV O(1) device round-trips per view
        from .registration import score_candidates
        cands = [self._make_camera(c) for c in pose_graph_left]
        scored = score_candidates(self.opt, self.cfgs, self.params,
                                  self.camera_set, cands, self.point_set)
        nums = [s[2] for s in scored]
        ratios = [s[1] for s in scored]
        views = [s[3] for s in scored]
        nums = np.asarray(nums, np.float64)
        score = (np.asarray(ratios) * np.clip(np.asarray(views), 0, 10)
                 + nums / max(nums.max(), 1))
        return pose_graph_left[int(np.argmax(score))]

    def _prune_observations(self, verbose=True, reproj: float = None):
        """Post-BA outlier-observation pruning (deviation, beyond
        reference — see `entities.prune_outlier_observations`). Gated by
        ``optim.prune.reproj_max`` (px); 0/absent = reference parity
        (keep every triangulated observation forever).

        Guard: when the calling BA cycle's mean reprojection ``reproj``
        is itself above the gate, the state is transiently diverged
        (poses untrustworthy) and pruning is skipped — outliers are only
        removable from a near-converged state."""
        pr = self.opt.optim.get("prune", {})
        thr = float(pr.get("reproj_max", 0.0) or 0.0)
        if thr <= 0.0:
            return
        if reproj is not None and (not np.isfinite(reproj) or reproj > thr):
            if verbose:
                print(f"[prune] skipped: mean reproj {reproj:.2f}px above "
                      f"the {thr}px gate (diverged state)")
            return
        n_rm, n_ret = entities.prune_outlier_observations(
            self.camera_set, self.point_set, thr_px=thr,
            min_track=int(pr.get("min_track", 2)),
            max_cam_frac=float(pr.get("max_cam_frac", 0.25)))
        if verbose and (n_rm or n_ret):
            print(f"[prune] dropped {n_rm} observations > {thr}px, "
                  f"retired {n_ret} points")

    def _ba_guard_pre(self, cam_ids):
        """Snapshot for one BA cycle when the divergence guard is on
        (``optim.ba_guard.factor`` > 0; 0/absent = reference parity:
        a diverged cycle's write-back is kept). Returns
        (pre_mean_reproj_px, geometry_snapshot, params_ref)."""
        g = self.opt.optim.get("ba_guard", {})
        if float(g.get("factor", 0.0) or 0.0) <= 0.0:
            return None, None, None
        pre = entities.mean_reprojection_px(self.camera_set, self.point_set,
                                            cam_ids)
        snap = entities.snapshot_geometry(self.camera_set, self.point_set)
        return pre, snap, self.params

    def _ba_guard_post(self, label, pre, snap, params_pre, cam_ids,
                       verbose=True) -> bool:
        """Deviation (beyond reference): roll one BA cycle back when it
        *diverged* — post-cycle mean reprojection worse than
        ``factor``× the pre-cycle value and above ``px_min`` (so normal
        fluctuation around the gate never triggers). Measured trigger
        case: view 23 of the 32-view flagship (66-inlier PnP) blew
        0.87 -> 4.2 px in one local-BA cycle; the reference
        (`LevelS2fM.py:349-431`) keeps such cycles and lets the error
        bake in. Returns True when rolled back (caller breaks the loop,
        keeping the pre-cycle state)."""
        if snap is None:
            return False
        g = self.opt.optim.get("ba_guard", {})
        factor = float(g.get("factor", 2.0))
        px_min = float(g.get("px_min", 2.0))
        post = entities.mean_reprojection_px(self.camera_set, self.point_set,
                                             cam_ids)
        # a non-finite post-cycle error IS divergence: `nan > x` is False,
        # so without the explicit check a NaN'd BA cycle sailed straight
        # past this guard (round-3 flagship, view-5 global BA)
        diverged = (not np.isfinite(post)) or (
            np.isfinite(pre) and post > max(factor * pre, px_min))
        if diverged:
            entities.restore_geometry(self.camera_set, self.point_set, snap)
            self.params = params_pre
            if verbose:
                print(f"[ba-guard] {label} cycle diverged "
                      f"({pre:.2f} -> {post:.2f}px); rolled back")
            return True
        return False

    def _finite_params_or_revert(self, label: str, params_prev) -> bool:
        """Post-phase field-health check: if any field-param leaf went
        non-finite, revert to the pre-phase pytree and log loudly.

        Deviation (beyond reference — the reference asserts and dies,
        `BA.py:206-218`): on an hours-long on-chip run, one poisoned
        phase must not cost the whole reconstruction. `guarded_update`
        makes this near-impossible at the step level; this is the
        phase-level backstop. Returns True when healthy."""
        import jax.numpy as jnp
        ok = all(bool(jnp.all(jnp.isfinite(leaf)))
                 for leaf in jax.tree.leaves(self.params)
                 if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.inexact))
        if not ok:
            print(f"WARNING: [field-guard] non-finite field params after "
                  f"{label}; reverting to pre-phase params")
            self.params = params_prev
        return ok

    def register_view(self, new_id: int, verbose=True) -> bool:
        """PnP + geo-init + BA cycles for one view (ref `:283-431`)."""
        opt = self.opt
        camera_new = self._make_camera(new_id)
        reg = Registration(opt, self.cfgs, self.camera_set)
        with self.timers.track("pnp"):
            reg_cfg = opt.get("registration", {})
            ok, ratio, num = reg.pnp(
                self.params, camera_new, self.point_set, if_nbv=True,
                min_inliers=int(reg_cfg.get("min_inliers", 0)),
                min_inlier_ratio=float(
                    reg_cfg.get("min_inlier_ratio", 0.0)))
        self.camera_set.eval_poses(verbose=verbose)
        if not ok:
            print("reconstruct fail")
            return False
        self.camera_set.add(camera_new)
        params_pre_geo = self.params
        with self.timers.track("geo_init"):
            self.params = reg.geo_init(self.params, camera_new, self.point_set,
                                       self.next_key(), verbose=verbose)
        self._finite_params_or_revert("geo_init", params_pre_geo)
        src_cam_id = reg.src_cam_id

        if opt.Ablate_config.get("ba_trad", False):
            # classic BA ablation: local then global, reprojection only
            from .trad import TradBundler
            for pick in ([new_id] + src_cam_id, None):
                b = TradBundler(opt, self.cfgs, self.camera_set, self.point_set,
                                cam_pick_ids=pick)
                self.params, _ = b.run(self.params, self.next_key(), verbose)
                self.camera_set.eval_poses(verbose=verbose)
            return True

        full = opt.get("sfm_mode", "full") == "full"
        if full:
            # reproj+rendering registration refine on the new cam (<=1 cycle)
            reproj, cycle = 100.0, 0
            while reproj > 2.5 and cycle < 1:
                params_pre_sr = self.params
                b = Bundler(opt, self.cfgs, self.camera_set, self.point_set,
                            cam_pick_ids=[new_id], mode="sfm_refine")
                self.params, reproj = b.run(self.params, self.next_key(), verbose)
                self._finite_params_or_revert("sfm_refine", params_pre_sr)
                self.camera_set.eval_poses(src_cam_id + [new_id], verbose=verbose)
                cycle += 1
        # local BA cycles
        reproj, cycle = 100.0, 0
        measured_reproj = None  # last MEASURED mean reproj (None = never)
        while reproj > 1.0 and cycle < 5:
            pre, snap, params_pre = self._ba_guard_pre([new_id] + src_cam_id)
            with self.timers.track("local_ba"):
                b = Bundler(opt, self.cfgs, self.camera_set, self.point_set,
                            cam_pick_ids=[new_id] + src_cam_id, mode="sfm")
                self.params, reproj = b.run(self.params, self.next_key(), verbose)
            if self._ba_guard_post("local BA", pre, snap, params_pre,
                                   [new_id] + src_cam_id, verbose):
                # after a rollback `pre` is the state's real mean reproj —
                # hand it to the post-loop prune gate (ADVICE r3 item 2)
                reproj = measured_reproj = pre
                break
            measured_reproj = reproj
            self.camera_set.eval_poses(src_cam_id + [new_id], verbose=verbose)
            cycle += 1
            # prune inside the loop from cycle 2 (the new camera's pose
            # has settled by then), so local BA can exit on the <1.0 px
            # gate instead of burning the 5-cycle cap on junk matches
            if cycle >= 2:
                self._prune_observations(verbose, reproj)
        self._prune_observations(verbose, measured_reproj)
        # global BA cycles
        reproj, cycle = 100.0, 0
        while reproj > 1.0 and cycle < 5:
            pre, snap, params_pre = self._ba_guard_pre(None)
            with self.timers.track("global_ba"):
                b = Bundler(opt, self.cfgs, self.camera_set, self.point_set,
                            mode="sfm")
                self.params, reproj = b.run(self.params, self.next_key(), verbose)
            if self._ba_guard_post("global BA", pre, snap, params_pre,
                                   None, verbose):
                reproj = pre
                break
            self.camera_set.eval_poses(verbose=verbose)
            cycle += 1
            # prune INSIDE the loop: the next cycle then optimizes and
            # gates on the cleaned observation set, so the loop can exit
            # on the <1.0 px gate instead of the 5-cycle cap
            self._prune_observations(verbose, reproj)
        if full:
            params_pre_ref = self.params
            with self.timers.track("refine"):
                r = Refiner(opt, self.cfgs, self.camera_set, self.point_set)
                self.params = r.run(self.params, self.next_key(), verbose)
            self._finite_params_or_revert("refine", params_pre_ref)
        r_deg, t_err, ate = self.camera_set.eval_poses(verbose=False)
        self.metrics.log(self.it, view=new_id, n_cams=len(self.camera_set),
                         n_points=len(self.point_set), reproj_px=reproj,
                         rot_err_deg=r_deg, t_err=t_err, ate=ate)
        return True

    # ------------------------------------------------------------ main loop
    def train(self, verbose=True, max_views: Optional[int] = None):
        opt = self.opt
        var = self.var
        pose_graph = list(var["pose_graph"])
        n_img = len(var["images"])
        if len(pose_graph) <= n_img / 2:
            print("------supplement the pose graph------------")
            pose_graph = pose_graph + [j for j in range(n_img) if j not in pose_graph]

        if self.cam_info_reloaded is not None:
            self._reload_scene()
            print("reloading finished")

        # Failure-deferral (config `registration.max_attempts`, default 1 =
        # reference parity: first failure aborts, `Registration.py:97-99` +
        # `LevelS2fM.py:306-308`). With max_attempts > 1, a failed view is
        # deferred — set aside until another view registers (new points =
        # new 2D-3D pairs = a real second chance) and retried up to
        # max_attempts times before being skipped for good. A framework
        # should not lose 19 views to one 0-inlier PnP (round-3 flagship).
        max_attempts = int(opt.get("registration", {}).get("max_attempts", 1))
        fail_counts: Dict[int, int] = {}
        deferred: set = set()   # failed since the last successful registration
        while True:
            if max_views is not None and len(self.camera_set) >= max_views:
                break
            if len(self.camera_set) < 2:
                if self.cam_info_reloaded is not None:
                    ids = self.cam_info_reloaded["cam_id"][:2]
                else:
                    ids = pose_graph[:2]
                self.initialize_two_views(ids[0], ids[1], verbose=verbose)
                self.save_checkpoint(latest=False)
                continue
            left = [p for p in pose_graph if p not in self.camera_set.cam_ids]
            print(f"---------------- {len(left)} frames left ------------------")
            if not left:
                print("finish!")
                break
            retryable = [p for p in left if fail_counts.get(p, 0) < max_attempts]
            if not retryable:
                print(f"finish! (skipped unregisterable views: {sorted(left)})")
                self.metrics.log(self.it, skipped_views=sorted(left))
                break
            eligible = [p for p in retryable if p not in deferred]
            if not eligible:
                # every retryable view has already failed against the
                # CURRENT scene state (deferred only clears on a new
                # registration). PnP here is deterministic (seeded
                # RANSAC, cpp/native/minigeom.cpp) and the fields/points
                # only change when a view registers, so an immediate
                # retry must fail identically — round-5 measured cost of
                # retry-anyway: ~30 min of attempt-burn cycles at the
                # synthref24 far-side frontier. Terminate cleanly with
                # the skip list instead (same contract as attempt
                # exhaustion; max_attempts now means "attempts, each
                # against a NEW scene state").
                print(f"finish! (skipped unregisterable views: "
                      f"{sorted(left)} — no scene change since their "
                      f"last failed attempt)")
                self.metrics.log(self.it, skipped_views=sorted(left))
                break
            new_id = self.select_next_view(eligible, verbose=verbose)
            print(f"-------------the best view next id is {new_id}--------------")
            if not self.register_view(new_id, verbose=verbose):
                fail_counts[new_id] = fail_counts.get(new_id, 0) + 1
                if max_attempts <= 1:
                    return False    # reference-parity abort
                deferred.add(new_id)
                print(f"[defer] view {new_id} failed registration "
                      f"(attempt {fail_counts[new_id]}/{max_attempts}); "
                      f"requeued")
                continue
            deferred.clear()    # fresh points: failed views get another look
            self.it += 1
            self.save_checkpoint(latest=(self.it % int(opt.freq.ckpt) != 0))
            if int(opt.freq.get("vis", 0)) and self.it % int(opt.freq.vis) == 0:
                self._view_artifacts(new_id)
        self._final_artifacts(verbose)
        return True

    def _view_artifacts(self, view_id: int):
        """Per-view in-training artifact dump at ``freq.vis`` — point
        cloud + cameras + a coarse mesh, plus an optional rendered/traced
        view when ``freq.vis_render`` is set (ref `pipelines/base.py:131-225`
        vis_geo_rgb; round-1 only dumped at the end of the run)."""
        out = self.opt.get("output_path", None)
        if not out:
            return
        try:
            from ..utils import export as export_mod
            vis_dir = os.path.join(out, "vis")
            os.makedirs(vis_dir, exist_ok=True)
            export_mod.export_pointcloud(
                self.point_set,
                os.path.join(vis_dir, f"{self.it:04d}_pointcloud.ply"))
            export_mod.export_cameras_json(
                self.camera_set, os.path.join(vis_dir, f"cam{self.it:04d}.json"))
            export_mod.extract_mesh(
                self.params, self.sdf_cfg,
                os.path.join(vis_dir, f"{self.it:04d}_mesh.ply"),
                resolution=int(self.opt.freq.get("vis_mesh_res", 64)),
                grid_boundary=(-0.6, 0.6))
            if int(self.opt.freq.get("vis_render", 0)):
                import imageio.v2 as imageio
                import numpy as _np
                cam = self.camera_set(view_id)
                img = export_mod.render_full_image(
                    self.params, self.cfgs, cam.pose(), cam.intr,
                    self.cfgs.H, self.cfgs.W)
                imageio.imwrite(
                    os.path.join(vis_dir, f"{self.it:04d}_render.png"),
                    (_np.clip(_np.asarray(img["rgb"]), 0, 1) * 255)
                    .astype(_np.uint8))
                self.metrics.log_image(self.it, "render/rgb", img["rgb"])
                from ..utils import vis as vis_mod
                self.metrics.log_image(
                    self.it, "render/depth",
                    vis_mod.colorize(_np.asarray(img["depth"])[..., 0]
                                     if _np.asarray(img["depth"]).ndim == 3
                                     else _np.asarray(img["depth"])))
        except Exception as e:  # artifact dumping must never kill a run
            Log.warn(f"per-view artifact export failed: {e}")

    def _final_artifacts(self, verbose=True):
        """Point cloud + camera dump + timing summary
        (ref vis_geo_rgb artifact surface, `pipelines/base.py:131-225`)."""
        if self.var is not None and self.var.get("depth_gt") is not None \
                and len(self.camera_set) >= 2:
            # GT-depth eval (ScanNet loaders carry depth_gt; see
            # utils/export.eval_depth_vs_gt)
            try:
                from ..utils import export as export_mod
                d = export_mod.eval_depth_vs_gt(
                    self.params, self.sdf_cfg, self.camera_set,
                    self.var["depth_gt"], verbose=verbose)
                self.metrics.log(self.it, depth_abs_rel=d["abs_rel"],
                                 depth_rmse=d["rmse"], depth_px=d["n_px"])
            except Exception as e:  # eval must never kill a finished run
                Log.warn(f"depth eval failed: {e}")
        out = self.opt.get("output_path", None)
        if out:
            try:
                from ..utils import export as export_mod
                export_mod.export_pointcloud(
                    self.point_set, os.path.join(out, "pointcloud.ply"))
                export_mod.export_cameras_json(
                    self.camera_set, os.path.join(out, "cameras.json"))
                from ..viz.html_viewer import export_html
                export_html(out)  # offline interactive viewer.html
            except Exception as e:  # artifact dumping must never kill a run
                Log.warn(f"artifact export failed: {e}")
        if verbose and self.timers.totals:
            Log.info("phase timing:", self.timers.summary())
        from ..utils import obs as _obs
        if verbose and _obs.HOST_TIMERS.totals:
            Log.info("host timing:", _obs.HOST_TIMERS.summary())
        if verbose and _obs.COMPILES.signatures:
            Log.info("compiled shape buckets:", _obs.COMPILES.summary())
