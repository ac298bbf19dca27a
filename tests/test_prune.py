"""Post-BA outlier-observation pruning (deviation beyond reference:
the reference keeps every triangulated observation forever,
`pipelines/LevelS2fM.py:404-418` exits global BA on the cycle cap when
junk observations set a reprojection floor)."""
import numpy as np

from level_s2fm_tpu.sfm import entities


def _make_cam(cid, kypts):
    return entities.Camera(
        id=cid,
        img=np.zeros((4, 4, 3), np.float32),
        intr=np.array([[100., 0., 50.], [0., 100., 50.], [0., 0., 1.]],
                      np.float32),
        pose_gt=np.eye(3, 4, dtype=np.float32),
        kypts=np.asarray(kypts, np.float32),
        matches=[], inlier_masks=[])


def _project(intr, xyz):
    uvw = xyz @ intr.T
    return uvw[:2] / uvw[2]


def test_prune_outliers_and_retire_short_tracks():
    intr = np.array([[100., 0., 50.], [0., 100., 50.], [0., 0., 1.]])
    # three points in front of both (identity-pose) cameras
    pts = np.array([[0.0, 0.0, 1.0],
                    [0.1, 0.0, 1.0],
                    [0.0, 0.1, 1.0]], np.float32)
    uv = np.stack([_project(intr, p) for p in pts], 0)

    # cam0 sees all three exactly; cam1 sees p0 exactly, p1 off by 10px,
    # p2 exactly
    cam0 = _make_cam(0, uv)
    uv1 = uv.copy()
    uv1[1] += [10.0, 0.0]
    cam1 = _make_cam(1, uv1)

    cs = entities.CameraSet()
    cs.add(cam0)
    cs.add(cam1)
    ps = entities.PointSet()
    ps.add_points(pts, [[(0, 0), (1, 0)], [(0, 1), (1, 1)], [(0, 2), (1, 2)]])
    cam0.idx2d_to_3d = np.array([0, 1, 2], np.int64)
    cam1.idx2d_to_3d = np.array([0, 1, 2], np.int64)

    n_rm, n_ret = entities.prune_outlier_observations(cs, ps, thr_px=3.0,
                                                      min_track=2)
    # cam1's p1 observation is 10px off -> removed; p1's track then has a
    # single entry -> retired, freeing cam0's keypoint too
    assert n_rm == 1
    assert n_ret == 1
    assert cam1.idx2d_to_3d[1] == -1
    assert cam0.idx2d_to_3d[1] == -1
    assert ps.tracks[1] == []
    assert list(ps.alive_mask()) == [True, False, True]
    # inlier observations untouched
    assert cam0.idx2d_to_3d[0] == 0 and cam1.idx2d_to_3d[2] == 2


def test_prune_behind_camera():
    intr = np.array([[100., 0., 50.], [0., 100., 50.], [0., 0., 1.]])
    pts = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]], np.float32)
    uv = np.array([_project(intr, pts[0]), [50.0, 50.0]], np.float32)
    cam = _make_cam(0, uv)
    cs = entities.CameraSet()
    cs.add(cam)
    ps = entities.PointSet()
    ps.add_points(pts, [[(0, 0)], [(0, 1)]])
    cam.idx2d_to_3d = np.array([0, 1], np.int64)

    n_rm, n_ret = entities.prune_outlier_observations(cs, ps, thr_px=1e9,
                                                      min_track=1)
    # behind-camera observation removed regardless of pixel threshold;
    # its track empties (min_track=1 keeps 1-entry tracks, but an empty
    # track is dead either way)
    assert n_rm == 1
    assert cam.idx2d_to_3d[1] == -1
    assert list(ps.alive_mask()) == [True, False]
    assert n_ret == 0


def test_prune_skips_camera_with_bad_pose():
    """max_cam_frac guard: when most of a camera's reprojections exceed
    the gate, the pose is the suspect — its observations survive."""
    intr = np.array([[100., 0., 50.], [0., 100., 50.], [0., 0., 1.]])
    pts = np.stack([[0.01 * i, 0.0, 1.0] for i in range(10)], 0)
    uv = np.stack([_project(intr, p) for p in pts], 0)
    cam = _make_cam(0, uv + [8.0, 0.0])   # everything 8px off: bad pose
    cs = entities.CameraSet()
    cs.add(cam)
    ps = entities.PointSet()
    ps.add_points(pts.astype(np.float32), [[(0, i)] for i in range(10)])
    cam.idx2d_to_3d = np.arange(10, dtype=np.int64)
    n_rm, n_ret = entities.prune_outlier_observations(cs, ps, thr_px=3.0,
                                                      min_track=1,
                                                      max_cam_frac=0.25)
    assert n_rm == 0 and n_ret == 0
    assert (cam.idx2d_to_3d != -1).all()


def test_mean_reprojection_and_geometry_snapshot():
    intr = np.array([[100., 0., 50.], [0., 100., 50.], [0., 0., 1.]])
    pts = np.array([[0.0, 0.0, 1.0], [0.1, 0.0, 1.0]], np.float32)
    uv = np.stack([_project(intr, p) for p in pts], 0)
    cam = _make_cam(0, uv + [2.0, 0.0])  # uniform 2px offset
    cs = entities.CameraSet()
    cs.add(cam)
    ps = entities.PointSet()
    ps.add_points(pts, [[(0, 0)], [(0, 1)]])
    cam.idx2d_to_3d = np.array([0, 1], np.int64)
    assert abs(entities.mean_reprojection_px(cs, ps) - 2.0) < 1e-4

    snap = entities.snapshot_geometry(cs, ps)
    cam.se3[:] = 0.3
    ps.xyz[0] = [9, 9, 9]
    entities.restore_geometry(cs, ps, snap)
    assert (cam.se3 == 0).all()
    assert np.allclose(ps.xyz[0], pts[0])
    assert abs(entities.mean_reprojection_px(cs, ps) - 2.0) < 1e-4


def test_ba_guard_rolls_back_divergence(tmp_path):
    """_ba_guard_pre/_ba_guard_post restore geometry + params when a
    cycle multiplies the mean reprojection past factor x pre."""
    from level_s2fm_tpu.config import build_options
    from level_s2fm_tpu.sfm.pipeline import LevelSfM
    opt = build_options([
        "--yaml=configs/synthetic.yaml", f"--output_root={tmp_path}",
        "--optim.ba_guard.factor=2.0", "--optim.ba_guard.px_min=2.0"])
    m = LevelSfM(opt, seed=0)
    intr = np.array([[100., 0., 50.], [0., 100., 50.], [0., 0., 1.]])
    pts = np.array([[0.0, 0.0, 1.0], [0.1, 0.0, 1.0]], np.float32)
    uv = np.stack([_project(intr, p) for p in pts], 0)
    cam = _make_cam(0, uv)
    m.camera_set.add(cam)
    m.point_set.add_points(pts, [[(0, 0)], [(0, 1)]])
    cam.idx2d_to_3d = np.array([0, 1], np.int64)

    pre, snap, params_pre = m._ba_guard_pre(None)
    assert pre < 1e-4
    cam.se3[3] = 0.1  # ~10px shift at f=100, past max(2*pre, px_min=2.0)
    assert m._ba_guard_post("local BA", pre, snap, params_pre, None,
                            verbose=False)
    assert entities.mean_reprojection_px(m.camera_set, m.point_set) < 1e-4
    # non-divergent cycle is kept
    pre, snap, params_pre = m._ba_guard_pre(None)
    cam.se3[3] = 1e-4
    assert not m._ba_guard_post("local BA", pre, snap, params_pre, None,
                                verbose=False)
    assert np.isclose(float(cam.se3[3]), 1e-4)


def test_prune_disabled_is_noop():
    """Pipeline gate: optim.prune absent/0 must leave state untouched."""
    from level_s2fm_tpu.config import build_options
    opt = build_options(["--yaml=configs/synthetic.yaml"])
    assert float(opt.optim.get("prune", {}).get("reproj_max", 0.0) or 0.0) \
        == 0.0
