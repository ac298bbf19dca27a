"""Multi-device sharding tests on the virtual 8-CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from level_s2fm_tpu.parallel import mesh as pmesh


@pytest.fixture
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pmesh.make_mesh(8)


def test_make_mesh(mesh8):
    assert mesh8.devices.size == 8
    assert mesh8.axis_names == (pmesh.DATA_AXIS,)


def test_shard_leading(mesh8):
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    xs = pmesh.shard_leading(x, mesh8)
    assert xs.sharding.spec == P(pmesh.DATA_AXIS, None)
    np.testing.assert_array_equal(np.asarray(xs), x)
    # non-divisible -> replicated
    y = pmesh.shard_leading(np.zeros((5, 3), np.float32), mesh8)
    assert y.sharding.spec in (P(), P(None, None))


def test_constrain_inside_jit(mesh8):
    with pmesh.use_mesh(mesh8):
        @jax.jit
        def f(x):
            y = pmesh.constrain(x * 2, axis=0)
            return y.sum()

        x = pmesh.shard_leading(np.ones((32, 4), np.float32), mesh8)
        assert float(f(x)) == 256.0


def test_sharded_grad_matches_single_device(mesh8):
    """Replicated params + sharded batch: grads must equal the
    single-device result (XLA inserts the psum)."""
    W = np.asarray(np.random.default_rng(0).normal(size=(4, 4)), np.float32)
    x = np.asarray(np.random.default_rng(1).normal(size=(32, 4)), np.float32)

    def loss(W, x):
        return jnp.mean((x @ W) ** 2)

    g_single = jax.grad(loss)(jnp.asarray(W), jnp.asarray(x))
    with pmesh.use_mesh(mesh8):
        Ws = pmesh.replicate(jnp.asarray(W), mesh8)
        xs = pmesh.shard_leading(x, mesh8)
        g_shard = jax.jit(jax.grad(loss))(Ws, xs)
    np.testing.assert_allclose(np.asarray(g_shard), np.asarray(g_single),
                               rtol=1e-5)


def test_dryrun_multichip_entry():
    """The driver-facing multi-chip dry run must compile and execute."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    n = min(8, len(jax.devices()))
    mod.dryrun_multichip(n)
