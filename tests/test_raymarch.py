"""Occupancy-grid ray marching + hard-stop compositing tests."""
import jax
import jax.numpy as jnp
import numpy as np

from level_s2fm_tpu.fields import embedder
from level_s2fm_tpu.rendering import raymarch as rm


def sphere_sdf(p, r=0.5):
    return (jnp.linalg.norm(p, axis=-1, keepdims=True) - r)


def test_occupancy_grid_marks_surface_band():
    grid = rm.build_occupancy_grid(sphere_sdf, jnp.zeros(3), jnp.ones(3),
                                   resolution=32, threshold=0.1)
    occ = np.asarray(grid.occ)
    g = (np.arange(32) + 0.5) / 32 * 2 - 1
    pts = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1)
    r = np.linalg.norm(pts, axis=-1)
    band = np.abs(r - 0.5) < 0.07
    assert occ[band].mean() > 0.95          # surface band occupied
    assert occ[r < 0.3].mean() < 0.05        # deep inside empty


def test_march_rays_valid_only_near_surface():
    grid = rm.build_occupancy_grid(sphere_sdf, jnp.zeros(3), jnp.ones(3),
                                   resolution=32, threshold=0.1)
    o = jnp.asarray([[0.0, 0.0, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    depths, deltas, valid = rm.march_rays(grid, o, d, n_samples=128)
    dv = np.asarray(depths)[0][np.asarray(valid)[0]]
    # valid samples cluster near the two sphere crossings (z=-0.5, z=0.5
    # -> depths 1.5 and 2.5)
    assert ((np.abs(dv - 1.5) < 0.2) | (np.abs(dv - 2.5) < 0.2)).all()
    assert len(dv) > 0


def test_composite_hard_stop_opaque_wall():
    N, S = 4, 64
    sig = jnp.full((N, S), 1000.0)
    rgbs = jnp.broadcast_to(jnp.asarray([1.0, 0.5, 0.25]), (N, S, 3))
    deltas = jnp.full((N, S), 0.01)
    valid = jnp.ones((N, S), bool)
    out = rm.composite_hard_stop(sig, rgbs, deltas, valid)
    np.testing.assert_allclose(np.asarray(out["opacity"]), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["rgb"])[:, 0], 1.0, atol=1e-3)


def test_trunc_exp_grad_clipped():
    g = jax.grad(lambda x: rm.trunc_exp(x))(30.0)
    assert np.isfinite(g)
    np.testing.assert_allclose(float(g), np.exp(15.0), rtol=1e-5)


def test_segment_mean():
    v = jnp.asarray([1.0, 3.0, 10.0])
    seg = jnp.asarray([0, 0, 1])
    out = np.asarray(rm.segment_mean(v, seg, 2))
    np.testing.assert_allclose(out, [2.0, 10.0])


def test_sh_embed_orthonormal_dc():
    dirs = np.random.default_rng(0).normal(size=(1000, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    sh = np.asarray(embedder.sh_embed(jnp.asarray(dirs), degree=4))
    assert sh.shape == (1000, 16)
    # DC term constant; integrals of higher bands over the sphere ~ 0
    np.testing.assert_allclose(sh[:, 0], 0.2820947917, atol=1e-6)
    assert np.abs(sh[:, 1:].mean(0)).max() < 0.05
