"""Trace re-eval dedup (`sdf._reeval_track_compact`): the compacted path
must reproduce the parity path EXACTLY (same points evaluated, duplicates
forward-filled), in values AND gradients, and must fall back to the full
eval when the unique-point count exceeds the static budget."""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from level_s2fm_tpu.fields import sdf as sdf_mod
from tests.test_dual_field import build


def _rays(rng, n=48):
    o = np.tile([[0.0, 0.0, -2.0]], (n, 1)).astype(np.float32)
    d = np.concatenate([rng.uniform(-0.2, 0.2, (n, 2)), np.ones((n, 1))],
                       -1).astype(np.float32)
    return jnp.asarray(o)[None], jnp.asarray(d)[None]


def _trace_outputs(params, cfg, o, d):
    res = sdf_mod.sphere_tracing(params["sdf"], cfg, o, d,
                                 key=jax.random.PRNGKey(0))
    return res.d_pred, res.sdf_surf, res.finish_mask


def test_compact_reeval_matches_parity(rng):
    params, sdf_cfg, _, _ = build(dual=False)
    o, d = _rays(rng)
    cfg_c = dataclasses.replace(sdf_cfg, reeval_compact=0.6)

    dp0, ss0, fm0 = _trace_outputs(params, sdf_cfg, o, d)
    dp1, ss1, fm1 = _trace_outputs(params, cfg_c, o, d)
    np.testing.assert_allclose(np.asarray(dp0), np.asarray(dp1),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ss0), np.asarray(ss1),
                               rtol=0, atol=1e-6)
    assert np.array_equal(np.asarray(fm0), np.asarray(fm1))


def test_compact_reeval_gradient_matches(rng):
    """The forward-fill must route (n_dups+1)x the gradient through the
    one evaluated point — identical cotangents to the parity path."""
    params, sdf_cfg, _, _ = build(dual=False)
    o, d = _rays(rng, n=32)

    def loss(p, cfg):
        res = sdf_mod.sphere_tracing(p, cfg, o, d, key=jax.random.PRNGKey(0))
        return jnp.sum(jnp.abs(res.d_pred)) + jnp.sum(jnp.abs(res.sdf_surf))

    cfg_c = dataclasses.replace(sdf_cfg, reeval_compact=0.6)
    g0 = jax.grad(lambda p: loss(p, sdf_cfg))(params["sdf"])
    g1 = jax.grad(lambda p: loss(p, cfg_c))(params["sdf"])
    for k in g0:
        a, b = jax.tree.leaves(g0[k]), jax.tree.leaves(g1[k])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-6)


def test_compact_reeval_overflow_falls_back(rng):
    """A budget smaller than the unique-point count must trigger the
    exact full-eval fallback, never a truncated sum."""
    params, sdf_cfg, _, _ = build(dual=False)
    o, d = _rays(rng, n=16)
    # every ray has at least the entry point unique -> 1/(E*BN) per-ray
    # floor; frac tiny enough that K < n_unique for sure
    cfg_tiny = dataclasses.replace(sdf_cfg, reeval_compact=1e-4)
    dp0, ss0, fm0 = _trace_outputs(params, sdf_cfg, o, d)
    dp1, ss1, fm1 = _trace_outputs(params, cfg_tiny, o, d)
    # same math; cond-wrapped compilation reassociates at the ULP level
    np.testing.assert_allclose(np.asarray(dp0), np.asarray(dp1),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ss0), np.asarray(ss1),
                               rtol=0, atol=1e-6)
    assert np.array_equal(np.asarray(fm0), np.asarray(fm1))


def test_compact_reeval_saves_rows(rng):
    """Trace-time accounting: the compact branch must gather only the
    budget K rows (plus the fallback branch, also traced by lax.cond —
    the counter sums both, so compare against parity + K)."""
    from level_s2fm_tpu.fields import hashgrid
    params, sdf_cfg, _, _ = build(dual=False)
    o, d = _rays(rng, n=16)

    def rows_for(cfg):
        try:
            hashgrid.TRACE_ROWS = {"fwd": 0, "tangent": 0}
            jax.jit(lambda p: sdf_mod.sphere_tracing(
                p, cfg, o, d, key=jax.random.PRNGKey(0)).d_pred).lower(
                    params["sdf"])
            return dict(hashgrid.TRACE_ROWS)
        finally:
            hashgrid.TRACE_ROWS = None

    frac = 0.5
    r_par = rows_for(sdf_cfg)
    r_cmp = rows_for(dataclasses.replace(sdf_cfg, reeval_compact=frac))
    reeval_parity = r_par["trace_reeval:fwd"]
    # compact traces BOTH cond branches: full (parity rows) + compact
    # (frac * parity rows)
    assert r_cmp["trace_reeval:fwd"] == reeval_parity + int(
        frac * reeval_parity)
    assert r_par["march:fwd"] == r_cmp["march:fwd"]  # march untouched


def test_march_compact_matches_parity(rng):
    """Per-step march compaction (cfg.march_compact) must not change the
    march: inactive slots are masked by the caller, active slots get the
    same values — identical trace outputs and gradients."""
    params, sdf_cfg, _, _ = build(dual=False)
    o, d = _rays(rng, n=40)
    cfg_m = dataclasses.replace(sdf_cfg, march_compact=0.5)

    dp0, ss0, fm0 = _trace_outputs(params, sdf_cfg, o, d)
    dp1, ss1, fm1 = _trace_outputs(params, cfg_m, o, d)
    np.testing.assert_allclose(np.asarray(dp0), np.asarray(dp1),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ss0), np.asarray(ss1),
                               rtol=0, atol=1e-6)
    assert np.array_equal(np.asarray(fm0), np.asarray(fm1))

    def loss(p, cfg):
        res = sdf_mod.sphere_tracing(p, cfg, o, d, key=jax.random.PRNGKey(0))
        return jnp.sum(jnp.abs(res.d_pred)) + jnp.sum(jnp.abs(res.sdf_surf))

    g0 = jax.grad(lambda p: loss(p, sdf_cfg))(params["sdf"])
    g1 = jax.grad(lambda p: loss(p, cfg_m))(params["sdf"])
    for x, y in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_march_and_reeval_compact_compose(rng):
    """Both knobs on together still reproduce the parity trace."""
    params, sdf_cfg, _, _ = build(dual=False)
    o, d = _rays(rng, n=40)
    cfg_b = dataclasses.replace(sdf_cfg, march_compact=0.5,
                                reeval_compact=0.6)
    dp0, ss0, fm0 = _trace_outputs(params, sdf_cfg, o, d)
    dp1, ss1, fm1 = _trace_outputs(params, cfg_b, o, d)
    np.testing.assert_allclose(np.asarray(dp0), np.asarray(dp1),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ss0), np.asarray(ss1),
                               rtol=0, atol=1e-6)
    assert np.array_equal(np.asarray(fm0), np.asarray(fm1))
