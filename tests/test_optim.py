"""Stacked-moment Adam must match optax.adam exactly.

``adam_stacked`` exists as a TPU-compiler workaround (see
level_s2fm_tpu/sfm/optim.py docstring); these tests pin that it is a pure
refactor of the optimizer *state layout*, not of its numerics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from level_s2fm_tpu.sfm import optim as optim_mod


def _params(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w": jax.random.normal(k1, (7, 5)),
        "b": jax.random.normal(k2, (5,)),
        "scalar": jax.random.normal(k3, ()),
    }


def _loss(p, x):
    return jnp.sum((x @ p["w"] + p["b"]) ** 2) + p["scalar"] ** 2


@pytest.mark.parametrize("schedule", [False, True])
def test_adam_stacked_matches_optax_adam(schedule):
    key = jax.random.PRNGKey(0)
    params = _params(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 7))

    if schedule:
        lr = lambda t: 1e-2 * 0.9 ** t
    else:
        lr = 1e-2
    tx_ref = optax.adam(learning_rate=lr)
    tx_new = optim_mod.adam_stacked(learning_rate=lr)

    p_ref, p_new = params, params
    o_ref, o_new = tx_ref.init(params), tx_new.init(params)
    for i in range(5):
        g_ref = jax.grad(_loss)(p_ref, x)
        g_new = jax.grad(_loss)(p_new, x)
        up_ref, o_ref = tx_ref.update(g_ref, o_ref, p_ref)
        up_new, o_new = tx_new.update(g_new, o_new, p_new)
        p_ref = optax.apply_updates(p_ref, up_ref)
        p_new = optax.apply_updates(p_new, up_new)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_new)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_stacked_state_is_single_buffer_per_leaf():
    params = _params(jax.random.PRNGKey(2))
    tx = optim_mod.scale_by_adam_stacked()
    state = tx.init(params)
    assert state.moments["w"].shape == (2, 7, 5)
    assert state.moments["scalar"].shape == (2,)


def test_phase_optimizer_runs_in_scan():
    """make_phase_optimizer must be scan-compatible (the phase loops scan
    the optimizer update on device)."""
    params = {"sdf": {"w": jnp.ones((4, 4))}, "se3_r": jnp.zeros((2, 3))}
    tx = optim_mod.make_phase_optimizer(
        params, {"sdf": "sdf", "se3_r": "pose_r"},
        {"sdf": 1e-3, "pose_r": 1e-2}, gamma=0.99)

    def f(carry):
        def body(c, _):
            p, o = c
            g = jax.tree.map(jnp.ones_like, p)
            up, o = tx.update(g, o, p)
            return (optax.apply_updates(p, up), o), None
        out, _ = jax.lax.scan(body, carry, None, length=3)
        return out

    p, o = jax.jit(f)((params, tx.init(params)))
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(p))
    # three unit-gradient adam steps at decaying lr move weights down
    assert float(p["sdf"]["w"][0, 0]) < 1.0
