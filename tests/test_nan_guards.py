"""NaN-hardening regression tests.

Motivated by the round-3 flagship failure: the 32-view run died with NaN
in global BA at view 13. Root cause family: `jnp.linalg.norm`'s VJP is
0/0 = NaN at an exactly-zero residual, and 0 * NaN = NaN means even a
masked-out observation poisons the whole gradient. The reference carries
a pdb trap for the same family (`pipelines/BA.py:142-145`); here the fix
is safe norms + clamped projection divisors + a guarded optimizer update
that skips (never applies) a non-finite step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from level_s2fm_tpu.sfm import losses as L
from level_s2fm_tpu.sfm.phases import guarded_update, project_points_per
from level_s2fm_tpu.geometry import transforms as T
from level_s2fm_tpu.fields import sdf as sdf_mod


def test_safe_norm_zero_residual_has_finite_grad():
    """linalg.norm NaNs its gradient at 0; safe_norm must not."""
    x = jnp.zeros((4, 2))

    def f_bad(x):
        return jnp.sum(jnp.linalg.norm(x, axis=-1))

    def f_good(x):
        return jnp.sum(L.safe_norm(x, axis=-1))

    g_bad = jax.grad(f_bad)(x)
    g_good = jax.grad(f_good)(x)
    assert not np.all(np.isfinite(g_bad))          # documents the hazard
    assert np.all(np.isfinite(g_good))

    # masked-out zero residual still poisons an unguarded sum (0*NaN=NaN)
    mask = jnp.array([1.0, 0.0, 0.0, 0.0])

    def f_masked_bad(x):
        return jnp.sum(jnp.linalg.norm(x, axis=-1) * mask)

    assert not np.all(np.isfinite(jax.grad(f_masked_bad)(x)))

    def f_masked_good(x):
        return jnp.sum(L.safe_norm(x, axis=-1) * mask)

    assert np.all(np.isfinite(jax.grad(f_masked_good)(x)))


def test_safe_norm_matches_linalg_away_from_zero():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(32, 3)))
    np.testing.assert_allclose(L.safe_norm(x, axis=-1),
                               jnp.linalg.norm(x, axis=-1), rtol=1e-6)


def test_guarded_update_skips_nonfinite_step():
    tx = optax.adam(1e-2)
    params = {"w": jnp.ones((3,)), "b": jnp.zeros(())}
    opt = tx.init(params)

    # finite grads: behaves exactly like a plain update
    g = {"w": jnp.full((3,), 0.5), "b": jnp.asarray(1.0)}
    p1, o1, bad = guarded_update(tx, g, opt, params)
    u, o_ref = tx.update(g, opt, params)
    p_ref = optax.apply_updates(params, u)
    assert bad == 0.0
    np.testing.assert_allclose(p1["w"], p_ref["w"], rtol=1e-6)

    # one NaN leaf: params unchanged, bad flag set
    g_nan = {"w": jnp.full((3,), jnp.nan), "b": jnp.asarray(1.0)}
    p2, o2, bad2 = guarded_update(tx, g_nan, opt, params)
    assert bad2 == 1.0
    np.testing.assert_array_equal(p2["w"], params["w"])
    np.testing.assert_array_equal(p2["b"], params["b"])
    # optimizer state stays finite (zeroed grads fed through)
    assert all(np.all(np.isfinite(l)) for l in jax.tree.leaves(o2))

    # inf leaf also trips the guard
    g_inf = {"w": jnp.zeros((3,)), "b": jnp.asarray(jnp.inf)}
    _, _, bad3 = guarded_update(tx, g_inf, opt, params)
    assert bad3 == 1.0


def test_project_points_behind_plane_bounded():
    """Points at/behind the image plane must not overflow uv or NaN the
    gradient (plain `z + eps` still crosses zero for z in (-eps, 0))."""
    K = jnp.eye(3) * jnp.asarray([100.0, 100.0, 1.0])
    pose = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    # z spans: healthy, exactly 0, the old poison zone (-eps < z < 0), behind
    pts = jnp.asarray([[0.1, 0.1, 1.0],
                       [0.1, 0.1, 0.0],
                       [0.1, 0.1, -1e-7],
                       [0.1, 0.1, -0.5]])
    uv, depth = T.project_points(pts[None], pose[None], K[None])
    assert np.all(np.isfinite(uv))

    def loss(pts):
        uv, _ = T.project_points(pts[None], pose[None], K[None])
        return jnp.sum(L.safe_norm(uv - 5.0, axis=-1))

    assert np.all(np.isfinite(jax.grad(loss)(pts)))

    # per-element variant used inside the jitted phases
    poses = jnp.broadcast_to(pose, (4, 3, 4))
    uv2, z2 = project_points_per(pts, poses, K)
    assert np.all(np.isfinite(uv2))


def test_get_surface_pts_zero_normal_bounded(monkeypatch):
    """A degenerate zero-gradient field region must not launch the
    surface-projected point to inf (divisor clamped)."""
    from tests.test_dual_field import build
    params, sdf_cfg, _, _ = build(dual=False)
    pts = jnp.asarray([[0.1, 0.2, 0.3], [0.0, 0.0, 0.0]])

    def fake_infer(params, cfg, xyz):
        sdf = jnp.full(xyz.shape[:-1] + (1,), 0.2)
        return sdf, None, jnp.zeros_like(xyz)      # exactly-zero normals

    monkeypatch.setattr(sdf_mod, "infer_all_with_normal", fake_infer)
    surf, nval = sdf_mod.get_surface_pts(params["sdf"], sdf_cfg, pts)
    assert np.all(np.isfinite(surf))
    # step length bounded by |sdf| under the clamp: 0/max(0,eps)*sdf = 0
    np.testing.assert_allclose(np.asarray(surf), np.asarray(pts))
