"""Renderer quadrature vs straightforward numpy implementations of the
reference formulas (mid-bin sampling, drop-last compositing, Laplace CDF,
bg blending)."""
import numpy as np

import jax.numpy as jnp

from level_s2fm_tpu.rendering import renderer as ren_mod


def test_sample_depth_midbin():
    min_d = jnp.asarray([[[1.0]]])
    max_d = jnp.asarray([[[3.0]]])
    d = np.asarray(ren_mod.sample_depth(min_d, max_d, 4))[0, 0, :, 0]
    # (0.5+i)/4 * 2 + 1
    np.testing.assert_allclose(d, [1.25, 1.75, 2.25, 2.75], atol=1e-6)


def test_sdf_to_sigma_laplace():
    beta, alpha = 0.1, 10.0
    sdf = np.asarray([-0.2, -0.05, 0.0, 0.05, 0.2], np.float32)
    out = np.asarray(ren_mod.sdf_to_sigma(jnp.asarray(sdf), alpha, beta))
    exp = 0.5 * np.exp(-np.abs(sdf) / beta)
    ref = alpha * np.where(sdf >= 0, exp, 1 - exp)
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def composite_numpy(ray, rgb, sigma, depth):
    """Reference quadrature (ref `Renderer.py:33-49`), straightforward numpy."""
    ray_len = np.linalg.norm(ray, axis=-1, keepdims=True)
    dint = depth[..., 1:] - depth[..., :-1]
    dist = dint * ray_len
    sd = sigma[..., :-1] * dist
    alpha = 1 - np.exp(-sd)
    T = np.exp(-np.cumsum(np.concatenate([np.zeros_like(sd[..., :1]), sd], -1),
                          -1))[..., :-1]
    prob = (T * alpha)[..., None]
    out_rgb = (rgb[..., :-1, :] * prob).sum(-2)
    return out_rgb, prob


def test_composite_matches_numpy(rng):
    B, HW, N = 1, 7, 16
    ray = rng.normal(size=(B, HW, 3)).astype(np.float32)
    rgb = rng.uniform(0, 1, size=(B, HW, N, 3)).astype(np.float32)
    sigma = rng.uniform(0, 5, size=(B, HW, N)).astype(np.float32)
    depth = np.sort(rng.uniform(1, 3, size=(B, HW, N)).astype(np.float32), -1)
    out_rgb, prob = ren_mod.composite(jnp.asarray(ray), jnp.asarray(rgb),
                                      jnp.asarray(sigma),
                                      jnp.asarray(depth)[..., None])
    ref_rgb, ref_prob = composite_numpy(ray, rgb, sigma, depth)
    np.testing.assert_allclose(np.asarray(out_rgb), ref_rgb, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob), ref_prob, rtol=1e-4,
                               atol=1e-5)


def test_opaque_surface_depth_and_bg():
    """A dense slab at depth ~2 gives opacity ~1 and expected depth ~2;
    empty rays return the bg color."""
    from tests.test_dual_field import build
    import dataclasses
    params, sdf_cfg, rad_cfg, ren_cfg = build(dual=False)
    cfg = dataclasses.replace(ren_cfg, bgcolor=(0.2, 0.4, 0.6), ray_chunk=None)
    center = jnp.asarray([[[0.0, 0.0, -2.0], [5.0, 5.0, 5.0]]])
    ray = jnp.asarray([[[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]]])
    out = ren_mod.render(params["sdf"], sdf_cfg, params["rad"], rad_cfg, cfg,
                         center, ray)
    op = np.asarray(out["opacity"])[0, :, 0]
    assert op[0] > 0.9          # hits the init sphere
    assert op[1] < 1e-3         # misses the AABB entirely
    np.testing.assert_allclose(np.asarray(out["rgb"])[0, 1], [0.2, 0.4, 0.6],
                               atol=1e-3)
    d = float(np.asarray(out["depth_mlp"])[0, 0, 0])
    assert abs(d - 1.5) < 0.1   # sphere front face at depth 2-0.5
