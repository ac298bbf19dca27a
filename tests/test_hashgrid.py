"""Hash-grid encoding unit tests: interpolation, grads, double-backward."""
import jax
import jax.numpy as jnp
import numpy as np

from level_s2fm_tpu.fields import hashgrid


def small_cfg():
    return hashgrid.HashGridConfig(n_levels=4, n_features_per_level=2,
                                   log2_hashmap_size=10, base_resolution=4,
                                   per_level_scale=1.5, include_input=True)


def test_out_dim():
    cfg = small_cfg()
    assert cfg.out_dim == 4 * 2 + 3


def test_encode_shape_and_finite(rng):
    cfg = small_cfg()
    table = hashgrid.init_table(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.uniform(0, 1, size=(5, 7, 3)).astype(np.float32))
    out = hashgrid.encode(table, x, cfg)
    assert out.shape == (5, 7, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_trilinear_interpolation_exact():
    """With a linear-in-x table pattern on a dense level, interpolation of a
    single-level grid must reproduce trilinear behavior: continuous and exact
    at corners."""
    cfg = hashgrid.HashGridConfig(n_levels=1, n_features_per_level=1,
                                  log2_hashmap_size=12, base_resolution=4,
                                  per_level_scale=1.0, include_input=False)
    res = int(cfg.resolutions()[0])
    # dense table: value = x-index of the corner
    table = np.zeros((1, cfg.table_size, 1), np.float32)
    for x in range(res + 1):
        for y in range(res + 1):
            for z in range(res + 1):
                idx = x + (res + 1) * (y + (res + 1) * z)
                table[0, idx, 0] = x
    table = jnp.asarray(table)
    # at corner positions, encoding == x-index; between corners, linear
    pts = jnp.asarray([[0.0, 0.0, 0.0], [0.25, 0.0, 0.0], [0.125, 0.5, 0.5]])
    out = np.asarray(hashgrid.encode(table, pts, cfg))[:, 0]
    np.testing.assert_allclose(out, [0.0, 1.0, 0.5], atol=1e-5)


def test_grad_wrt_table_and_input(rng):
    cfg = small_cfg()
    table = hashgrid.init_table(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.uniform(0.1, 0.9, size=(16, 3)).astype(np.float32))

    def loss_t(t):
        return jnp.sum(hashgrid.encode(t, x, cfg) ** 2)

    def loss_x(xx):
        return jnp.sum(hashgrid.encode(table, xx, cfg) ** 2)

    gt = jax.grad(loss_t)(table)
    gx = jax.grad(loss_x)(x)
    assert np.isfinite(np.asarray(gt)).all() and np.abs(np.asarray(gt)).sum() > 0
    assert np.isfinite(np.asarray(gx)).all()


def test_double_backward(rng):
    """Second-order: grad of (grad wrt input) wrt table — the eikonal-in-BA
    pattern (SURVEY.md §7.3)."""
    cfg = small_cfg()
    table = hashgrid.init_table(jax.random.PRNGKey(2), cfg)
    x = jnp.asarray(rng.uniform(0.1, 0.9, size=(8, 3)).astype(np.float32))

    def eikonal(t):
        def f(xx):
            return jnp.sum(hashgrid.encode(t, xx, cfg))
        g = jax.grad(f)(x)
        return jnp.sum((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    gt = jax.grad(eikonal)(table)
    assert np.isfinite(np.asarray(gt)).all()


def test_embed_includes_raw_input(rng):
    cfg = small_cfg()
    table = hashgrid.init_table(jax.random.PRNGKey(3), cfg)
    xyz = jnp.asarray(rng.uniform(-1, 1, size=(4, 3)).astype(np.float32))
    out = hashgrid.embed(table, xyz, cfg, (-1, -1, -1), (1, 1, 1), rescale=2.0)
    np.testing.assert_allclose(np.asarray(out[:, :3]), np.asarray(xyz) / 2.0, atol=1e-6)


def test_config_from_opt_scale():
    """per-level scale b = exp(ln(2048*scale/N_min)/(L-1))."""
    from level_s2fm_tpu.config import Opt
    opt = Opt({"SDF": {"Hash_config": {}},
               "data": {"bound_min": [-1, -1, -1], "bound_max": [1, 1, 1]}})
    cfg = hashgrid.config_from_opt(opt)
    assert abs(cfg.per_level_scale - np.exp(np.log(2048 / 16) / 15)) < 1e-6


def test_bf16_gather_f32_accumulation(rng):
    """bf16 compute tables: forward reads bf16 payloads but the backward
    scatter-add MUST accumulate in f32 — thousands of small per-sample
    cotangents landing in one coarse cell vanish at bf16 precision
    (round-2 measured NaN source in init training)."""
    import dataclasses
    cfg = dataclasses.replace(small_cfg(), compute_dtype="bfloat16")
    cfg_f32 = small_cfg()
    table = hashgrid.init_table(jax.random.PRNGKey(0), cfg)
    # many points in ONE coarse cell -> all 4096 cotangents hit the same
    # 8 table entries
    x = jnp.asarray(rng.uniform(0.30, 0.35, size=(4096, 3)).astype(np.float32))

    def loss(t, c):
        return jnp.sum(hashgrid.encode(t, x, c)) * 1e-4

    g_bf16 = jax.grad(loss)(table, cfg)
    g_f32 = jax.grad(loss)(table, cfg_f32)
    assert g_bf16.dtype == table.dtype
    nz = np.abs(np.asarray(g_f32)) > 0
    assert nz.sum() > 0
    # f32 accumulation: summed-cotangent relative error stays tiny even
    # though each individual payload read was bf16
    rel = np.abs(np.asarray(g_bf16 - g_f32))[nz] / np.abs(np.asarray(g_f32))[nz]
    assert np.median(rel) < 1e-5, f"median rel err {np.median(rel)}"


def test_bf16_forward_close_to_f32(rng):
    import dataclasses
    cfg16 = dataclasses.replace(small_cfg(), compute_dtype="bfloat16")
    cfg32 = small_cfg()
    table = hashgrid.init_table(jax.random.PRNGKey(1), cfg32)
    x = jnp.asarray(rng.uniform(0, 1, size=(256, 3)).astype(np.float32))
    o16 = np.asarray(hashgrid.encode(table, x, cfg16))
    o32 = np.asarray(hashgrid.encode(table, x, cfg32))
    # bf16 has ~3 decimal digits; table init is ~1e-4 scale
    assert np.max(np.abs(o16 - o32)) < 2e-2 * max(np.max(np.abs(o32)), 1e-6)
    np.testing.assert_allclose(o16, o32, atol=5e-3, rtol=1e-2)
