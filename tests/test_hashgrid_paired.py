"""Paired dense-level gather (HashGridConfig.paired_dense) equivalence.

The paired path fetches x-adjacent corner pairs of the dense levels as one
2-row XLA gather slice; it must reproduce the default row-gather path's
values, spatial Jacobians, table gradients, and double backward exactly
(same table layout, same trilerp math — only the fetch shape changes).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from level_s2fm_tpu.fields import hashgrid


def cfgs(**kw):
    base = hashgrid.HashGridConfig(n_levels=6, n_features_per_level=2,
                                   log2_hashmap_size=10, base_resolution=4,
                                   per_level_scale=1.7, include_input=False,
                                   **kw)
    return base, dataclasses.replace(base, paired_dense=True)


def test_dense_prefix_is_nontrivial():
    cfg, cfg_p = cfgs()
    # resolutions 4,6,11,19,33,56 -> (r+1)^3 <= 1024 for 4 and 6 only
    assert cfg.n_dense_levels == 2
    assert cfg_p.paired_dense and not cfg.paired_dense


@pytest.mark.parametrize("bf16", [False, True])
def test_encode_values_match(rng, bf16):
    cfg, cfg_p = cfgs(compute_dtype="bfloat16" if bf16 else "float32")
    table = hashgrid.init_table(jax.random.PRNGKey(3), cfg) * 1e4
    x = jnp.asarray(rng.uniform(0, 1, size=(257, 3)).astype(np.float32))
    # include exact corners and the domain boundary
    x = jnp.concatenate([x, jnp.zeros((1, 3)), jnp.ones((1, 3)),
                         jnp.asarray([[0.25, 1.0, 0.0]])], axis=0)
    a = hashgrid.encode(table, x, cfg)
    b = hashgrid.encode(table, x, cfg_p)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)


def test_encode_with_grad_matches(rng):
    cfg, cfg_p = cfgs()
    table = hashgrid.init_table(jax.random.PRNGKey(4), cfg) * 1e4
    # interior points only: at exact lattice/boundary points the two paths
    # make different (both valid) subgradient choices
    x = jnp.asarray(rng.uniform(0.01, 0.99, size=(301, 3)).astype(np.float32))
    ea, da = hashgrid.encode_with_grad(table, x, cfg)
    eb, db = hashgrid.encode_with_grad(table, x, cfg_p)
    np.testing.assert_allclose(np.asarray(ea), np.asarray(eb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(da), np.asarray(db), atol=1e-4)


def test_jacobian_gate_zero_outside_domain():
    cfg, cfg_p = cfgs()
    table = hashgrid.init_table(jax.random.PRNGKey(5), cfg) * 1e4
    x = jnp.asarray([[-0.05, 0.5, 0.5], [0.5, 1.2, 0.5]], dtype=jnp.float32)
    ea, da = hashgrid.encode_with_grad(table, x, cfg)
    eb, db = hashgrid.encode_with_grad(table, x, cfg_p)
    # clamp-to-edge: identical values, (numerically) zero Jacobian in the
    # clamped dim — the hashed tail cancels duplicate clipped corners only
    # up to f32 rounding, same as the default path
    np.testing.assert_allclose(np.asarray(ea), np.asarray(eb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(da), np.asarray(db), atol=1e-5)
    assert np.allclose(np.asarray(db)[0, :, 0], 0.0, atol=1e-5)
    assert np.allclose(np.asarray(db)[1, :, 1], 0.0, atol=1e-5)


def test_table_gradients_match(rng):
    cfg, cfg_p = cfgs()
    table = hashgrid.init_table(jax.random.PRNGKey(6), cfg)
    x = jnp.asarray(rng.uniform(0.01, 0.99, size=(123, 3)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(123, cfg.out_dim)).astype(np.float32))

    def loss(t, c):
        return jnp.sum(hashgrid.encode(t, x, c) * cot)

    ga = jax.grad(lambda t: loss(t, cfg))(table)
    gb = jax.grad(lambda t: loss(t, cfg_p))(table)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-5)


def test_double_backward_matches(rng):
    """Eikonal-in-BA shape: grad of (spatial-grad norm) w.r.t. the table."""
    cfg, cfg_p = cfgs()
    table = hashgrid.init_table(jax.random.PRNGKey(7), cfg)
    x = jnp.asarray(rng.uniform(0.05, 0.95, size=(41, 3)).astype(np.float32))

    def eik(t, c):
        def f(p):
            return jnp.sum(hashgrid.encode(t, p[None], c))
        g = jax.vmap(jax.grad(f))(x)
        return jnp.sum((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    ga = jax.grad(lambda t: eik(t, cfg))(table)
    gb = jax.grad(lambda t: eik(t, cfg_p))(table)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-4)


def test_jit_and_reference_config(rng):
    """Full 16-level reference config under jit, both paths agree."""
    cfg = hashgrid.HashGridConfig()  # L=16, T=2^19: dense prefix ~5 levels
    cfg_p = dataclasses.replace(cfg, paired_dense=True)
    assert 1 <= cfg.n_dense_levels < cfg.n_levels
    table = hashgrid.init_table(jax.random.PRNGKey(8), cfg)
    x = jnp.asarray(rng.uniform(0, 1, size=(64, 3)).astype(np.float32))
    a = jax.jit(lambda t, p: hashgrid.encode(t, p, cfg))(table, x)
    b = jax.jit(lambda t, p: hashgrid.encode(t, p, cfg_p))(table, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
