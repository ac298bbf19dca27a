"""Frontier PnP threshold sweep: why are the remaining views failing?

For every unregistered view of a checkpointed run, rebuilds the 2D-3D
pairs exactly as `Registration.pnp` does (get_pairs + SDF gate) and
reports RANSAC inlier counts across a range of `pnp_max_error_px`
gates. Reading the output:

- counts GROW with the gate  -> the 3D points are displaced (SDF drift /
  grazing triangulations); consider a wider `optim.pnp_max_error_px`.
- counts SATURATE            -> the non-inlier pairs are wrong
  correspondences; the pose is supported by the saturated count, and
  the `registration.min_inliers` / `min_inlier_ratio` floors should be
  judged against THAT number (see results/synthhard_r5.md — the 0.3
  ratio floor was rejecting correct 33-inlier frontier poses).

Usage:
  PYTHONPATH=/root/repo python scripts/diag_frontier_pnp.py \
      output/<run_dir> --yaml=configs/<cfg>.yaml [extra overrides...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GATES = (1.5, 2.0, 2.5, 3.0, 4.0)


def main():
    run_dir = sys.argv[1]
    overrides = sys.argv[2:]
    from level_s2fm_tpu.config import build_options
    opt = build_options(overrides + ["--cpu",
                                     f"--output_path={run_dir}", "--resume"])
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import train as trainmod
    from level_s2fm_tpu.sfm.pipeline import LevelSfM
    from level_s2fm_tpu.sfm.registration import Registration
    from level_s2fm_tpu.sfm import hostgeom
    from level_s2fm_tpu.fields import sdf as sdf_mod

    model = LevelSfM(opt, seed=int(opt.get("seed", 0)))
    model.load_data(trainmod.build_var(opt))
    model.restore_checkpoint()
    model._reload_scene()
    n_img = len(model.var["images"])
    print("registered cams:", sorted(model.camera_set.cam_ids))
    left = [v for v in range(n_img) if v not in model.camera_set.cam_ids]
    print("unregistered:", left)
    if not left:
        return
    hdr = "view pairs gated " + " ".join(f"in@{g}px" for g in GATES)
    print(hdr)
    for vid in left:
        cam_new = model._make_camera(vid)
        reg = Registration(opt, model.cfgs, model.camera_set)
        pairs = reg.get_pairs(cam_new, model.point_set)
        if pairs is None:
            print(f"{vid} 0 0 " + " ".join("-" for _ in GATES))
            continue
        p3d, p2d, _, _ = pairs
        sdfs = np.asarray(
            sdf_mod.infer_sdf_host(model.params["sdf"], model.cfgs.sdf, p3d))
        mask = sdfs < 0.05
        p3d_m, p2d_m = p3d[mask], p2d[mask]
        cols = []
        for thr in GATES:
            res = hostgeom.pnp_ransac(p2d_m, p3d_m, cam_new.intr,
                                      max_error_px=thr)
            n_in = int(np.sum(res.inliers)) if res.success else 0
            cols.append(str(n_in))
        print(f"{vid} {len(p3d)} {len(p3d_m)} " + " ".join(cols), flush=True)


if __name__ == "__main__":
    main()
