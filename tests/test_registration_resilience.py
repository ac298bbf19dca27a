"""Round-4 resilience regressions — every test here reproduces a failure
mode that killed or degraded the round-3 32-view flagship run:

* Adam-moment overflow NaN'ing params THROUGH the grad-only guard
  (view-5 global BA: finite-but-huge grads -> inf moments -> NaN update);
* read-only ``np.asarray(jax_array)`` pose views crashing the ba-guard
  rollback on every resumed attempt ("assignment destination is
  read-only");
* ``nan > threshold`` being False, letting a NaN'd BA cycle sail past the
  divergence guard;
* one failed PnP aborting the whole reconstruction (19 views lost);
* ``geo_init`` returning ``src_cam_id`` (a list) instead of params when
  no segment exists.
"""
import os
import types

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from level_s2fm_tpu.config import build_options
from level_s2fm_tpu.data import synthetic
from level_s2fm_tpu.sfm import entities
from level_s2fm_tpu.sfm.phases import guarded_update
from level_s2fm_tpu.sfm.pipeline import LevelSfM

BASE = [
    "--yaml=configs/synthetic.yaml",
    "--optim.init.max_iter=25",
    "--optim.geoinit.max_iter=3",
    "--optim.ba.max_iter=16",
    "--optim.refine.max_iter=8",
]


# ---------------------------------------------------------------- optimizer
def test_guarded_update_catches_nan_update_from_poisoned_moments():
    """Finite grads + inf Adam moments produce a NaN update (inf/inf);
    the update-level check must skip the step and the sanitizer must
    reset the poisoned moments so later steps recover."""
    tx = optax.adam(1e-2)
    params = {"w": jnp.ones((3,))}
    opt = tx.init(params)
    opt_poisoned = jax.tree.map(
        lambda x: (jnp.full_like(x, jnp.inf)
                   if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)
                   else x),
        opt)
    g = {"w": jnp.full((3,), 0.5)}          # perfectly finite gradient
    # document the hazard: the raw update is non-finite
    u_raw, _ = tx.update(g, opt_poisoned, params)
    assert not np.all(np.isfinite(u_raw["w"]))

    p, o, bad = guarded_update(tx, g, opt_poisoned, params)
    assert bad == 1.0
    np.testing.assert_array_equal(p["w"], params["w"])   # step skipped
    assert all(np.all(np.isfinite(l)) for l in jax.tree.leaves(o)
               if jnp.issubdtype(jnp.asarray(l).dtype, jnp.inexact))

    # moments sanitized -> the NEXT step with the same finite grad applies
    p2, o2, bad2 = guarded_update(tx, g, o, p)
    assert bad2 == 0.0
    assert not np.allclose(p2["w"], p["w"])


def test_guarded_update_survives_huge_finite_grads():
    """A ~1e20 f32 gradient overflows Adam's second moment (g**2 = inf)
    while every gradient stays finite — the round-3 failure signature.
    Params must remain finite across repeated poisoned steps."""
    tx = optax.adam(1e-2)
    params = {"w": jnp.ones((4,))}
    opt = tx.init(params)
    g_huge = {"w": jnp.full((4,), 1e20, jnp.float32)}
    for _ in range(5):
        params, opt, _ = guarded_update(tx, g_huge, opt, params)
        assert np.all(np.isfinite(params["w"]))
        assert all(np.all(np.isfinite(l)) for l in jax.tree.leaves(opt)
                   if jnp.issubdtype(jnp.asarray(l).dtype, jnp.inexact))
    # and a normal gradient afterwards still optimizes
    g_ok = {"w": jnp.full((4,), 0.1)}
    p2, _, bad = guarded_update(tx, g_ok, opt, params)
    assert bad == 0.0 and np.all(np.isfinite(p2["w"]))


# ---------------------------------------------------------------- entities
def _mini_scene():
    """Two cameras + three points with real tracks, tiny arrays."""
    rng = np.random.default_rng(0)
    cams = entities.CameraSet()
    pts = entities.PointSet()
    xyz = rng.normal(size=(3, 3)).astype(np.float32) * 0.1
    pts.add_points(xyz, [[(0, 0), (1, 0)], [(0, 1), (1, 1)], [(0, 2), (1, 2)]])
    for cid in range(2):
        kypts = rng.uniform(10, 50, size=(4, 2)).astype(np.float32)
        cam = entities.Camera(
            id=cid, img=np.zeros((8, 8, 3), np.float32),
            intr=np.asarray([[40.0, 0, 4], [0, 40.0, 4], [0, 0, 1]],
                            np.float32),
            pose_gt=np.eye(3, 4, dtype=np.float32),
            kypts=kypts, matches=[np.zeros((0, 2), np.int64)],
            inlier_masks=[np.zeros(0, bool)])
        cam.idx2d_to_3d[:3] = [0, 1, 2]
        cams.add(cam)
    return cams, pts


def test_camera_se3_writable_after_jax_writeback():
    """np.asarray of a jax array is READ-ONLY; Camera must defensively
    copy so rollback's in-place writes never crash (round-3 resume loop)."""
    ro = np.asarray(jnp.zeros(6, jnp.float32))
    assert not ro.flags.writeable                    # documents the hazard
    cam = entities.Camera(
        id=0, img=np.zeros((4, 4, 3), np.float32), intr=np.eye(3, dtype=np.float32),
        pose_gt=np.eye(3, 4, dtype=np.float32),
        kypts=np.zeros((2, 2), np.float32),
        matches=[np.zeros((0, 2), np.int64)], inlier_masks=[np.zeros(0, bool)],
        se3=ro, idx2d_to_3d=np.asarray(jnp.full((2,), -1, jnp.int64)))
    cam.se3[:] = 1.0                                 # must not raise
    cam.idx2d_to_3d[0] = 5

    # restore_geometry must survive even a read-only se3 slipped in later
    cams, pts = _mini_scene()
    snap = entities.snapshot_geometry(cams, pts)
    for c in cams.cameras:
        c.se3 = np.asarray(jnp.full(6, 9.0, jnp.float32))   # read-only view
    entities.restore_geometry(cams, pts, snap)
    for c, s in zip(cams.cameras, snap[0]):
        np.testing.assert_array_equal(c.se3, s)
        c.se3[:] = 2.0                               # writable again


def test_ba_guard_rolls_back_nonfinite_post():
    """`nan > x` is False: a NaN'd BA cycle must still trigger rollback."""
    cams, pts = _mini_scene()
    opt = build_options(BASE + ["--optim.ba_guard.factor=2.0",
                                "--optim.ba_guard.px_min=2.0"])
    dummy = types.SimpleNamespace(opt=opt, camera_set=cams, point_set=pts,
                                  params={"sdf": jnp.zeros(3)})
    pre, snap, params_pre = LevelSfM._ba_guard_pre(dummy, None)
    assert np.isfinite(pre)
    # corrupt one pose to NaN: post-cycle mean reproj becomes nan
    cams.cameras[0].se3 = np.full(6, np.nan, np.float32)
    rolled = LevelSfM._ba_guard_post(dummy, "test", pre, snap, params_pre,
                                     None, verbose=False)
    assert rolled
    assert np.all(np.isfinite(cams.cameras[0].se3))
    post = entities.mean_reprojection_px(cams, pts, None)
    np.testing.assert_allclose(post, pre, rtol=1e-6)


def test_eval_poses_diagnoses_nonfinite(capsys):
    cams, pts = _mini_scene()
    cams.cameras[1].se3 = np.full(6, np.nan, np.float32)
    r, t, ate = cams.eval_poses(verbose=False)
    assert np.isnan(r) and np.isnan(t) and np.isnan(ate)
    out = capsys.readouterr().out
    assert "non-finite pose" in out and "1" in out


# ---------------------------------------------------------------- pipeline
def test_defer_failed_registration(tmp_path, monkeypatch):
    """One transient registration failure must defer the view, not abort
    the reconstruction (config registration.max_attempts > 1)."""
    opt = build_options(BASE + ["--sfm_mode=fast", f"--output_root={tmp_path}",
                                "--registration.max_attempts=3"])
    scene = synthetic.make_scene(n_views=4, H=64, W=64, n_points=200, seed=0)
    m = LevelSfM(opt, seed=0)
    m.load_data(synthetic.scene_to_var(scene))

    real = LevelSfM.register_view
    failed = []

    def flaky(self, new_id, verbose=True):
        if not failed:                       # first attempted view fails once
            failed.append(new_id)
            return False
        return real(self, new_id, verbose=verbose)

    monkeypatch.setattr(LevelSfM, "register_view", flaky)
    assert m.train(verbose=False)
    assert failed, "the injected failure never triggered"
    assert len(m.camera_set) == 4            # every view still registered
    assert failed[0] in m.camera_set.cam_ids # including the deferred one


def test_skip_list_when_view_never_registers(tmp_path, monkeypatch):
    """A view that fails max_attempts times is skipped (with a logged
    skip-list) and the run still completes cleanly."""
    opt = build_options(BASE + ["--sfm_mode=fast", f"--output_root={tmp_path}",
                                "--registration.max_attempts=2"])
    scene = synthetic.make_scene(n_views=4, H=64, W=64, n_points=200, seed=0)
    var = synthetic.scene_to_var(scene)
    m = LevelSfM(opt, seed=0)
    m.load_data(var)
    doomed = int(list(var["pose_graph"])[3])

    real = LevelSfM.register_view

    def flaky(self, new_id, verbose=True):
        if new_id == doomed:
            return False
        return real(self, new_id, verbose=verbose)

    monkeypatch.setattr(LevelSfM, "register_view", flaky)
    assert m.train(verbose=False)            # completes despite the bad view
    assert len(m.camera_set) == 3
    assert doomed not in m.camera_set.cam_ids
    skipped = [r for r in m.metrics.history if "skipped_views" in r]
    assert skipped and skipped[-1]["skipped_views"] == [doomed]


def test_parity_abort_when_defer_disabled(tmp_path, monkeypatch):
    """Default max_attempts=1 keeps reference semantics: first failure
    aborts (`LevelS2fM.py:306-308`)."""
    opt = build_options(BASE + ["--sfm_mode=fast", f"--output_root={tmp_path}"])
    scene = synthetic.make_scene(n_views=3, H=64, W=64, n_points=200, seed=0)
    m = LevelSfM(opt, seed=0)
    m.load_data(synthetic.scene_to_var(scene))
    monkeypatch.setattr(LevelSfM, "register_view",
                        lambda self, new_id, verbose=True: False)
    assert m.train(verbose=False) is False
    assert len(m.camera_set) == 2            # only the init pair


def test_geo_init_empty_segs_returns_params(tmp_path):
    """With no covisible source view, geo_init must return the params
    pytree unchanged — NOT src_cam_id (VERDICT r3 weak-item 3)."""
    from level_s2fm_tpu.sfm.registration import Registration
    opt = build_options(BASE + [f"--output_root={tmp_path}"])
    scene = synthetic.make_scene(n_views=3, H=64, W=64, n_points=50, seed=0)
    m = LevelSfM(opt, seed=0)
    m.load_data(synthetic.scene_to_var(scene))
    reg = Registration(opt, m.cfgs, m.camera_set)   # empty camera set
    cam = m._make_camera(0)
    out = reg.geo_init(m.params, cam, m.point_set, m.next_key(),
                       verbose=False)
    assert out is m.params                           # identity, same pytree


def test_min_inlier_ratio_gate(tmp_path, monkeypatch):
    """A PnP whose inlier/pair ratio is below registration.min_inlier_ratio
    must be rejected BEFORE any scene-state mutation (the 1200x1600
    synthref run accepted a 4/13 = 0.31-ratio pose that blew local BA
    0.7 -> 42 px); ratio 0 keeps reference parity (any count accepted)."""
    from level_s2fm_tpu.sfm import registration as reg_mod
    opt = build_options(BASE + [f"--output_root={tmp_path}"])
    scene = synthetic.make_scene(n_views=3, H=64, W=64, n_points=50, seed=0)
    m = LevelSfM(opt, seed=0)
    m.load_data(synthetic.scene_to_var(scene))
    reg = reg_mod.Registration(opt, m.cfgs, m.camera_set)
    cam = m._make_camera(0)

    n = 20
    rng = np.random.RandomState(0)
    pairs = (rng.randn(n, 3).astype(np.float32),
             rng.rand(n, 2).astype(np.float32) * 64,
             np.arange(n), np.arange(n))
    monkeypatch.setattr(reg_mod.Registration, "get_pairs",
                        lambda self, c, ps: pairs)
    monkeypatch.setattr(reg_mod.sdf_mod, "infer_sdf_host",
                        lambda p, c, x: np.zeros(len(x), np.float32))
    inliers = np.zeros(n, bool)
    inliers[:6] = True                                   # ratio 6/20 = 0.3
    res = types.SimpleNamespace(success=True, inliers=inliers,
                                R=np.eye(3), t=np.zeros(3))
    monkeypatch.setattr(reg_mod.hostgeom, "pnp_ransac", lambda *a, **k: res)

    n_pts_before = len(m.point_set)
    ok, ratio, cnt = reg.pnp(m.params, cam, m.point_set, if_nbv=True,
                             min_inlier_ratio=0.5)
    assert ok is False and cnt == 6
    assert abs(ratio - 0.3) < 1e-6
    assert len(m.point_set) == n_pts_before              # no mutation
    assert (cam.idx2d_to_3d == -1).all()

    # parity default (ratio floor 0) accepts the same result (dry_run to
    # keep the test free of the write-back machinery)
    ok2, _, _ = reg.pnp(m.params, cam, m.point_set, if_nbv=True,
                        dry_run=True)
    assert ok2 is True


def test_no_futile_retries_when_scene_unchanged(tmp_path, monkeypatch):
    """Round-5: retrying a failed view against an UNCHANGED scene state is
    provably futile (PnP RANSAC is deterministically seeded; fields/points
    only change on a successful registration), so once every retryable
    view has failed since the last success the run terminates cleanly
    instead of burning the remaining attempts (measured: ~30 min of
    attempt-burn cycles at the synthref24 far-side frontier)."""
    opt = build_options(BASE + ["--sfm_mode=fast", f"--output_root={tmp_path}",
                                "--registration.max_attempts=10"])
    scene = synthetic.make_scene(n_views=4, H=64, W=64, n_points=200, seed=0)
    var = synthetic.scene_to_var(scene)
    m = LevelSfM(opt, seed=0)
    m.load_data(var)
    doomed = {int(v) for v in list(var["pose_graph"])[2:]}  # all but init pair
    attempts = []

    def flaky(self, new_id, verbose=True):
        attempts.append(new_id)
        return False                         # nothing past init ever registers

    monkeypatch.setattr(LevelSfM, "register_view", flaky)
    assert m.train(verbose=False)            # clean skip-list termination
    # each doomed view tried EXACTLY once: no scene change between fails
    assert sorted(attempts) == sorted(doomed)
    skipped = [r for r in m.metrics.history if "skipped_views" in r]
    assert skipped and set(skipped[-1]["skipped_views"]) == doomed


def test_geoinit_ray_budget_cap(tmp_path, capsys):
    """Round-5: optim.geoinit.max_rays caps the pair-ray count (the
    uncapped 4096-ray GeoInitPhase bucket compiles past the v5e's HBM).
    With a tiny cap the registration must still triangulate and complete;
    with cap 0 (reference parity) no subsampling happens."""
    opt = build_options(BASE + ["--sfm_mode=fast", f"--output_root={tmp_path}",
                                "--optim.geoinit.max_rays=16"])
    scene = synthetic.make_scene(n_views=3, H=64, W=64, n_points=200, seed=0)
    m = LevelSfM(opt, seed=0)
    m.load_data(synthetic.scene_to_var(scene))
    assert m.train(verbose=True, max_views=3)
    out = capsys.readouterr().out
    assert "[geoinit] ray budget:" in out
    assert len(m.camera_set) == 3
    assert len(m.point_set) > 0              # still triangulates a subset
    # phase bucket stayed at the floor bucket despite many raw matches
    assert "subsampled to 16" in out or "subsampled to 1" in out
