"""Two-view initialization demo — the reference notebook, as a script.

Equivalent of `notebooks/two-view-init.ipynb` (the reference's de-facto
smoke test, SURVEY.md §4): run two-view initialization standalone, print
pose errors, render slerp novel views between the two cameras, export the
triangulated cloud + match visualization.

Usage: python examples/two_view_init_demo.py [--cpu] [--iters 200]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--out", default="output/two_view_demo")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from level_s2fm_tpu.config import build_options
    from level_s2fm_tpu.data import synthetic
    from level_s2fm_tpu.geometry import lie
    from level_s2fm_tpu.sfm.pipeline import LevelSfM
    from level_s2fm_tpu.utils import export as export_mod
    from level_s2fm_tpu.utils import marching_cubes as mc
    from level_s2fm_tpu.utils import vis

    opt = build_options([f"--optim.init.max_iter={args.iters}",
                         f"--output_root={args.out}"],
                        yaml_path="configs/synthetic.yaml")
    scene = synthetic.make_scene(n_views=2, H=64, W=64, n_points=256, seed=0)
    model = LevelSfM(opt, seed=0)
    model.load_data(synthetic.scene_to_var(scene))
    model.initialize_two_views(0, 1)

    out_dir = opt.output_path
    os.makedirs(out_dir, exist_ok=True)
    # triangulated cloud
    export_mod.export_pointcloud(model.point_set,
                                 os.path.join(out_dir, "init_points.ply"))
    # match visualization between the two views
    cam0, cam1 = model.camera_set.cameras
    i0, i1 = cam0.matched_kypt_ids(cam1.id)
    vis.draw_matches(cam0.img, cam1.img, cam0.kypts[i0], cam1.kypts[i1],
                     os.path.join(out_dir, "matches.jpg"), vis_num=100)
    # slerp novel views between the two registered cameras
    p0, p1 = cam0.pose(), cam1.pose()
    frames = []
    import imageio.v2 as imageio
    for i, t in enumerate(np.linspace(0, 1, 5)):
        pose_t = np.asarray(lie.slerp_pose(jnp.asarray(p0), jnp.asarray(p1),
                                           float(t)))
        img = export_mod.render_full_image(model.params, model.cfgs, pose_t,
                                           cam0.intr, model.cfgs.H,
                                           model.cfgs.W, ray_batch=4096)
        frames.append((np.clip(img["rgb"], 0, 1) * 255).astype(np.uint8))
        imageio.imwrite(os.path.join(out_dir, f"slerp_{i}.png"), frames[-1])
    imageio.mimsave(os.path.join(out_dir, "slerp.gif"), frames, fps=4, loop=0)
    print(f"demo artifacts in {out_dir}: init_points.ply, matches.jpg, slerp.gif")


if __name__ == "__main__":
    main()
