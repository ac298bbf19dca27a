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
