"""Trace-time gather-row accounting (bench.py roofline metric): the
counter must report exactly L*8 rows per encoded point forward, and the
same count again on the tangent path (whose transpose is the backward
table-cotangent scatter)."""
import jax
import jax.numpy as jnp
import numpy as np

from level_s2fm_tpu.fields import hashgrid


def _cfg():
    return hashgrid.HashGridConfig(n_levels=4, n_features_per_level=2,
                                   log2_hashmap_size=10, base_resolution=4,
                                   per_level_scale=1.5)


def test_trace_rows_counts_encode(rng=None):
    cfg = _cfg()
    table = hashgrid.init_table(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).uniform(0.1, 0.9, (32, 3)),
                    jnp.float32)
    try:
        hashgrid.TRACE_ROWS = {"fwd": 0, "tangent": 0}
        jax.jit(lambda t: jnp.sum(hashgrid.encode(t, x, cfg))).lower(table)
        fwd_only = dict(hashgrid.TRACE_ROWS)

        hashgrid.TRACE_ROWS = {"fwd": 0, "tangent": 0}
        jax.jit(jax.grad(
            lambda t: jnp.sum(hashgrid.encode(t, x, cfg)))).lower(table)
        with_bwd = dict(hashgrid.TRACE_ROWS)
    finally:
        hashgrid.TRACE_ROWS = None

    expect = cfg.n_levels * 32 * 8          # 8 corners per level per point
    assert fwd_only["fwd"] == expect
    assert fwd_only["tangent"] == 0          # no AD on the forward-only trace
    assert with_bwd["fwd"] == expect
    assert with_bwd["tangent"] == expect     # backward scatter rows == fwd rows


def test_trace_rows_disabled_by_default():
    cfg = _cfg()
    table = hashgrid.init_table(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(1).uniform(0.1, 0.9, (8, 3)),
                    jnp.float32)
    assert hashgrid.TRACE_ROWS is None
    out = hashgrid.encode(table, x, cfg)     # must not crash or count
    # encode returns the grid features only (the raw-input concat lives
    # in the embedder wrapper)
    assert out.shape == (8, cfg.n_levels * cfg.n_features_per_level)
    assert hashgrid.TRACE_ROWS is None


def test_trace_site_attribution():
    """Rows traced inside hashgrid.trace_site("x") are ALSO accumulated
    under "x:<kind>" so the bench can split the roofline between march /
    re-eval / render consumers; totals are unchanged."""
    cfg = _cfg()
    table = hashgrid.init_table(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(2).uniform(0.1, 0.9, (16, 3)),
                    jnp.float32)

    def f(t):
        with hashgrid.trace_site("siteA"):
            a = jnp.sum(hashgrid.encode(t, x, cfg))
        b = jnp.sum(hashgrid.encode(t, x, cfg))      # untagged
        return a + b

    try:
        hashgrid.TRACE_ROWS = {"fwd": 0, "tangent": 0}
        jax.jit(jax.grad(f)).lower(table)
        rows = dict(hashgrid.TRACE_ROWS)
    finally:
        hashgrid.TRACE_ROWS = None

    per_call = cfg.n_levels * 16 * 8
    assert rows["fwd"] == 2 * per_call               # totals include both
    assert rows["tangent"] == 2 * per_call
    assert rows["siteA:fwd"] == per_call             # only the tagged call
    assert rows["siteA:tangent"] == per_call
    assert not hashgrid.TRACE_SITE                   # stack unwound
