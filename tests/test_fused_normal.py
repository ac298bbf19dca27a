"""Fused analytic normal must match autodiff exactly, incl. second order."""
import jax
import jax.numpy as jnp
import numpy as np

from level_s2fm_tpu.fields import hashgrid, sdf as sdf_mod


def small_sdf_cfg(bg_sdf=False):
    grid = hashgrid.HashGridConfig(n_levels=4, n_features_per_level=2,
                                   log2_hashmap_size=10, base_resolution=4,
                                   per_level_scale=1.6)
    # tf_init=False: the geometric init zeroes first-layer weights on the
    # hash features, which makes table gradients legitimately zero at init
    return sdf_mod.SDFConfig(grid=grid, layers=(None, 32, 8), inside=True,
                             bg_sdf=bg_sdf, sphere_bias=0.5, iters_max=4,
                             tf_init=False)


def autodiff_gradient(params, cfg, xyz):
    def sdf_sum(p):
        return sdf_mod.infer_sdf(params, cfg, p).sum()
    return jax.grad(sdf_sum)(xyz)


def test_analytic_normal_matches_autodiff(rng):
    cfg = small_sdf_cfg()
    params = sdf_mod.init_params(jax.random.PRNGKey(0), cfg)
    xyz = jnp.asarray(rng.uniform(-0.9, 0.9, size=(64, 3)).astype(np.float32))
    sdf1, feat1, normal = sdf_mod.infer_all_with_normal(params, cfg, xyz)
    sdf2, feat2 = sdf_mod.infer_all(params, cfg, xyz)
    np.testing.assert_allclose(np.asarray(sdf1), np.asarray(sdf2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(feat1), np.asarray(feat2), atol=1e-6)
    g = autodiff_gradient(params, cfg, xyz)
    np.testing.assert_allclose(np.asarray(normal), np.asarray(g),
                               rtol=1e-4, atol=1e-5)


def test_analytic_normal_bg_sdf(rng):
    cfg = small_sdf_cfg(bg_sdf=True)
    params = sdf_mod.init_params(jax.random.PRNGKey(0), cfg)
    xyz = jnp.asarray(rng.uniform(-0.9, 0.9, size=(64, 3)).astype(np.float32))
    sdf1, _, normal = sdf_mod.infer_all_with_normal(params, cfg, xyz)
    sdf2 = sdf_mod.infer_sdf(params, cfg, xyz)
    np.testing.assert_allclose(np.asarray(sdf1), np.asarray(sdf2), atol=1e-6)
    g = autodiff_gradient(params, cfg, xyz)
    np.testing.assert_allclose(np.asarray(normal), np.asarray(g),
                               rtol=1e-4, atol=1e-5)


def test_second_order_through_fused_normal(rng):
    """Eikonal loss on the fused normal must be differentiable w.r.t. the
    table (the BA pattern)."""
    cfg = small_sdf_cfg()
    params = sdf_mod.init_params(jax.random.PRNGKey(0), cfg)
    xyz = jnp.asarray(rng.uniform(-0.9, 0.9, size=(16, 3)).astype(np.float32))

    def eik(table):
        p = {**params, "table": table}
        _, _, n = sdf_mod.infer_all_with_normal(p, cfg, xyz)
        return jnp.mean((jnp.linalg.norm(n, axis=-1) - 1.0) ** 2)

    g = jax.grad(eik)(params["table"])
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0

    # compare against the eikonal grad computed via pure autodiff normals
    def eik_ad(table):
        p = {**params, "table": table}
        n = autodiff_gradient(p, cfg, xyz)
        return jnp.mean((jnp.linalg.norm(n, axis=-1) - 1.0) ** 2)

    g2 = jax.grad(eik_ad)(params["table"])
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2), rtol=1e-3,
                               atol=1e-6)


def test_get_surface_pts_matches_two_pass(rng):
    """The fused surface projection (one gather pass) must equal the
    two-pass composition infer_sdf + gradient, incl. param gradients."""
    cfg = small_sdf_cfg()
    params = sdf_mod.init_params(jax.random.PRNGKey(1), cfg)
    pts = jnp.asarray(rng.uniform(-0.8, 0.8, size=(48, 3)).astype(np.float32))

    def two_pass(p, x):
        sdf = sdf_mod.infer_sdf(p, cfg, jax.lax.stop_gradient(x))
        normals = sdf_mod.gradient(p, cfg, x)
        nval = jnp.linalg.norm(normals, axis=-1, keepdims=True)
        surf = x - normals / jax.lax.stop_gradient(nval) * sdf
        return surf, nval

    surf1, nval1 = sdf_mod.get_surface_pts(params, cfg, pts)
    surf2, nval2 = two_pass(params, pts)
    np.testing.assert_allclose(np.asarray(surf1), np.asarray(surf2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nval1), np.asarray(nval2),
                               rtol=1e-5, atol=1e-6)

    # param gradients of a BA-style loss must match too (second order
    # through the normals path)
    def loss_fused(p):
        surf, nv = sdf_mod.get_surface_pts(p, cfg, pts)
        return jnp.sum(surf ** 2) + jnp.mean(jnp.abs(nv - 1.0))

    def loss_two(p):
        surf, nv = two_pass(p, pts)
        return jnp.sum(surf ** 2) + jnp.mean(jnp.abs(nv - 1.0))

    g1 = jax.grad(loss_fused)(params)
    g2 = jax.grad(loss_two)(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_infer_with_normal_chunked_matches_direct(rng):
    cfg = small_sdf_cfg(bg_sdf=True)
    params = sdf_mod.init_params(jax.random.PRNGKey(2), cfg)
    # 5 chunks of 3 -> exercises padding (13 % 3 != 0)
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, size=(13, 3)).astype(np.float32))
    s1, g1 = sdf_mod.infer_with_normal_chunked(params, cfg, pts, chunk=3)
    s2 = sdf_mod.infer_sdf(params, cfg, pts)
    g2 = sdf_mod.gradient(params, cfg, pts)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)
    # single-chunk fast path
    s3, g3 = sdf_mod.infer_with_normal_chunked(params, cfg, pts, chunk=64)
    np.testing.assert_allclose(np.asarray(s3), np.asarray(s2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g2), rtol=1e-5, atol=1e-6)
