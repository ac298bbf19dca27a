"""Batched NBV PnP scoring equals the per-candidate loop.

`registration.score_candidates` replaces the reference's
O(candidates x full PnP) NBV sweep (`LevelS2fM.py:243-282`) with one
covisibility sweep + one bucketed SDF dispatch; the scores must be
identical to scoring each candidate with `Registration.pnp(dry_run=True)`.
"""
import numpy as np
import pytest

from level_s2fm_tpu.config import build_options
from level_s2fm_tpu.data import synthetic
from level_s2fm_tpu.sfm import registration as reg_mod
from level_s2fm_tpu.sfm.pipeline import LevelSfM

ARGS = [
    "--yaml=configs/synthetic.yaml",
    "--optim.init.max_iter=20",
    "--optim.geoinit.max_iter=2",
    "--optim.ba.max_iter=10",
    "--sfm_mode=fast",
]


@pytest.fixture(scope="module")
def two_view_state(tmp_path_factory):
    """Pipeline state after two-view init + one registration: 3 cams
    registered, several candidates left to score."""
    out = tmp_path_factory.mktemp("out")
    opt = build_options(ARGS + [f"--output_root={out}"])
    scene = synthetic.make_scene(n_views=6, H=64, W=64, n_points=256, seed=1)
    var = synthetic.scene_to_var(scene)
    m = LevelSfM(opt, seed=0)
    m.load_data(var)
    ok = m.train(max_views=3, verbose=False)
    assert ok
    return m


def _loop_scores(m, cand_ids):
    """The pre-batching implementation: one full dry-run PnP per candidate."""
    out = []
    for cand in cand_ids:
        cam = m._make_camera(cand)
        reg = reg_mod.Registration(m.opt, m.cfgs, m.camera_set)
        ok, ratio, num = reg.pnp(m.params, cam, m.point_set,
                                 if_nbv=False, dry_run=True)
        out.append((ok, ratio, num, len(reg.src_cam_id)))
    return out


def test_batched_scores_match_loop(two_view_state):
    m = two_view_state
    cand_ids = [c for c in range(6) if c not in m.camera_set.cam_ids]
    assert len(cand_ids) == 3
    cams = [m._make_camera(c) for c in cand_ids]
    batched = reg_mod.score_candidates(m.opt, m.cfgs, m.params,
                                       m.camera_set, cams, m.point_set)
    looped = _loop_scores(m, cand_ids)
    assert len(batched) == len(looped)
    for b, l in zip(batched, looped):
        assert b[0] == l[0]                      # ok
        assert b[2] == l[2]                      # inlier count
        assert b[3] == l[3]                      # n source views
        np.testing.assert_allclose(b[1], l[1], atol=1e-12)  # ratio


def test_select_next_view_uses_batched(two_view_state, monkeypatch):
    m = two_view_state
    m.opt.nbv_mode = "pnp"
    left = [c for c in range(6) if c not in m.camera_set.cam_ids]
    choice = m.select_next_view(left, verbose=False)
    assert choice in left
    # the choice agrees with scoring the loop way
    looped = _loop_scores(m, left)
    nums = np.asarray([s[2] for s in looped], np.float64)
    score = (np.asarray([s[1] for s in looped])
             * np.clip(np.asarray([s[3] for s in looped]), 0, 10)
             + nums / max(nums.max(), 1))
    assert choice == left[int(np.argmax(score))]


def test_no_pair_candidate_scores_zero(two_view_state, monkeypatch):
    """A candidate with no covisible matches gets (False, 0, 0, 0)."""
    m = two_view_state
    monkeypatch.setattr(reg_mod.Registration, "get_pairs",
                        lambda self, cam, ps: None)
    cam = m._make_camera(4)
    res = reg_mod.score_candidates(m.opt, m.cfgs, m.params,
                                   m.camera_set, [cam], m.point_set)
    assert res == [(False, 0.0, 0, 0)]
