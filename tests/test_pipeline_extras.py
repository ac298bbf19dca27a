"""Pipeline extras: full mode (sfm_refine + rendering refine), PnP-scored
NBV selection, numbered checkpoints."""
import os

import numpy as np
import pytest

from level_s2fm_tpu.config import build_options
from level_s2fm_tpu.data import synthetic
from level_s2fm_tpu.sfm.pipeline import LevelSfM

BASE = [
    "--yaml=configs/synthetic.yaml",
    "--optim.init.max_iter=25",
    "--optim.geoinit.max_iter=3",
    "--optim.ba.max_iter=16",
    "--optim.refine.max_iter=8",
]


def test_full_mode_with_refine(tmp_path):
    opt = build_options(BASE + ["--sfm_mode=full", f"--output_root={tmp_path}"])
    scene = synthetic.make_scene(n_views=3, H=64, W=64, n_points=200, seed=0)
    m = LevelSfM(opt, seed=0)
    m.load_data(synthetic.scene_to_var(scene))
    ok = m.train(max_views=3, verbose=False)
    assert ok
    assert len(m.point_set) > 20
    # checkpoints: latest + the numbered copy at it=0 (freq.ckpt default 5)
    out = os.path.join(str(tmp_path), "0_test", "debug")
    assert os.path.exists(os.path.join(out, "model.ckpt"))


def test_get_result_refine_again(tmp_path):
    """`--get_result --refine_again` reloads the scene from the latest
    checkpoint, runs the long rendering-refine (tiny budget here), saves,
    and exports (ref `LevelS2fM.py:207-218` load_all + refine path)."""
    opt = build_options(BASE + ["--sfm_mode=fast", f"--output_root={tmp_path}"])
    scene = synthetic.make_scene(n_views=3, H=64, W=64, n_points=200, seed=0)
    m = LevelSfM(opt, seed=0)
    m.load_data(synthetic.scene_to_var(scene))
    assert m.train(max_views=3, verbose=False)

    opt2 = build_options(BASE + [
        "--sfm_mode=fast", f"--output_root={tmp_path}", "--resume",
        "--get_result", "--refine_again", "--refine_again_iters=6",
    ])
    from level_s2fm_tpu.sfm.bundle import Refiner
    from level_s2fm_tpu.utils import export
    m2 = LevelSfM(opt2, seed=0)
    m2.load_data(synthetic.scene_to_var(scene))
    m2.restore_checkpoint()
    m2._reload_scene()
    n_before = len(m2.camera_set)
    refiner = Refiner(opt2, m2.cfgs, m2.camera_set, m2.point_set,
                      max_iter=int(opt2.refine_again_iters))
    m2.params = refiner.run(m2.params, m2.next_key())
    m2.save_checkpoint(latest=True)
    export.export_results(opt2, m2, resolution=24)
    assert len(m2.camera_set) == n_before == 3
    out = opt2.output_path
    assert os.path.exists(os.path.join(out, "model.ckpt"))
    assert os.path.exists(os.path.join(out, "pointcloud.ply"))
    assert os.path.exists(os.path.join(out, "mesh", "high_res.ply"))
    assert os.path.exists(os.path.join(out, "cameras.json"))


def test_nbv_pnp_scoring(tmp_path):
    opt = build_options(BASE + ["--sfm_mode=fast", "--nbv_mode=pnp",
                                f"--output_root={tmp_path}"])
    scene = synthetic.make_scene(n_views=4, H=64, W=64, n_points=200, seed=0)
    m = LevelSfM(opt, seed=0)
    m.load_data(synthetic.scene_to_var(scene))
    m.initialize_two_views(0, 1, verbose=False)
    nbv = m.select_next_view([2, 3], verbose=False)
    assert nbv in (2, 3)
    # with a ring of cameras 0-1-2-3, view 2 overlaps the registered pair
    # much more than view 3
    assert nbv == 2


def test_prune_hooks_in_pipeline(tmp_path):
    """optim.prune.reproj_max enables post-BA observation pruning inside
    register_view; the run completes with consistent camera/point state
    (every surviving idx2d_to_3d entry backed by a live track)."""
    opt = build_options(BASE + [
        "--sfm_mode=fast", f"--output_root={tmp_path}",
        "--optim.prune.reproj_max=3.0", "--optim.prune.min_track=2"])
    scene = synthetic.make_scene(n_views=3, H=64, W=64, n_points=200, seed=0)
    m = LevelSfM(opt, seed=0)
    m.load_data(synthetic.scene_to_var(scene))
    assert m.train(max_views=3, verbose=False)
    alive = m.point_set.alive_mask()
    for ci, cam in enumerate(m.camera_set.cameras):
        for k in np.where(cam.idx2d_to_3d != -1)[0]:
            pid = int(cam.idx2d_to_3d[k])
            assert alive[pid]
            assert (ci, int(k)) in [tuple(e) for e in m.point_set.tracks[pid]]
    # retired points carry no dangling camera references
    for pid in np.where(~alive)[0]:
        for cam in m.camera_set.cameras:
            assert not (cam.idx2d_to_3d == pid).any()


def test_get_result_auto_restores(tmp_path):
    """`--get_result` without `--resume`/`--load` restores the checkpoint
    automatically through the train.py surface (regression: it previously
    exported from empty scene state and crashed in _reload_scene)."""
    import train as train_mod
    train_mod.main(BASE + ["--sfm_mode=fast", "--max_views=3",
                           f"--output_root={tmp_path}"])
    m = train_mod.main(BASE + ["--sfm_mode=fast",
                               f"--output_root={tmp_path}", "--get_result"])
    assert len(m.camera_set) == 3
    out = m.opt.output_path
    assert os.path.exists(os.path.join(out, "mesh", "high_res.ply"))
    assert os.path.exists(os.path.join(out, "sparse", "0", "points3D.bin"))
    assert os.path.exists(os.path.join(out, "viewer.html"))


def test_get_result_vis_all_rgb(tmp_path):
    """--get_result --vis_all_rgb dumps per-camera depth/normal/render
    images and a novel-view video (ref base.py vis_all_rgb surface)."""
    import os
    import train as train_mod

    out = str(tmp_path / "run")
    argv = ["--yaml=configs/synthetic.yaml", "--cpu", "--sfm_mode=fast",
            "--max_views=2", f"--output_path={out}",
            "--optim.init.max_iter=4", "--optim.geoinit.max_iter=1",
            "--optim.ba.max_iter=2", "--optim.refine.max_iter=2"]
    train_mod.main(argv)
    train_mod.main(argv + ["--get_result", "--vis_all_rgb",
                           "--vis_all_rgb_video_views=2"])
    img_all = os.path.join(out, "image_all")
    files = os.listdir(img_all)
    for cam_id in (0, 1):
        for stem in (f"dp_{cam_id}.jpg", f"norm_{cam_id}.jpg",
                     f"rgb_render_{cam_id}.jpg", f"dp_render_{cam_id}.jpg",
                     f"norm_render_{cam_id}.jpg", f"rgb_gt_{cam_id}.jpg"):
            assert stem in files, (stem, files)
        assert any(f.startswith(f"novel_view_{cam_id}.") for f in files), files
