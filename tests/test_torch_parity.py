"""Numerical parity of MLP building blocks against torch oracles.

Validates that our functional weight-norm linear + softplus(beta=100)
and the radiance decoder (sigmoid, no inner activation — the reference's
dead-ReLU quirk) match torch's `nn.utils.weight_norm` semantics exactly.
The oracles are built HERE from torch primitives (not imported from the
reference repo).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from level_s2fm_tpu.fields import mlp


def _torch_weight_norm_linear(V, g, b):
    lin = torch.nn.Linear(V.shape[1], V.shape[0])
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(np.asarray(V)))
        lin.bias.copy_(torch.from_numpy(np.asarray(b)))
    lin = torch.nn.utils.weight_norm(lin)
    with torch.no_grad():
        lin.weight_g.copy_(torch.from_numpy(np.asarray(g)))
        lin.weight_v.copy_(torch.from_numpy(np.asarray(V)))
    return lin


def test_geometry_mlp_matches_torch(rng):
    key = jax.random.PRNGKey(0)
    params = mlp.init_geometry_mlp(key, input_dim=12, layers=[None, 16, 8],
                                   sphere_bias=0.7, tf_init=True)
    x = rng.normal(size=(32, 12)).astype(np.float32)

    layers = []
    for p in params["layers"]:
        layers.append(_torch_weight_norm_linear(np.asarray(p["V"]),
                                                np.asarray(p["g"]),
                                                np.asarray(p["b"])))
    sp = torch.nn.Softplus(beta=100, threshold=20)
    with torch.no_grad():
        t = torch.from_numpy(x)
        for li, lin in enumerate(layers):
            t = lin(t)
            if li <= len(layers) - 2:
                t = sp(t)
        ref = t.numpy()

    out = np.asarray(mlp.apply_geometry_mlp(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_radiance_mlp_matches_torch_dead_relu(rng):
    """Three weight-norm linears, NO inner activation, final sigmoid —
    the reference's `Radiance` runtime behavior (`models/base.py:255-258`
    loops over an empty ModuleList)."""
    key = jax.random.PRNGKey(1)
    params = mlp.init_radiance_mlp(key, input_dim=10, layers=[None, 8, 8, 3])
    x = rng.normal(size=(16, 10)).astype(np.float32)

    layers = [_torch_weight_norm_linear(np.asarray(p["V"]), np.asarray(p["g"]),
                                        np.asarray(p["b"]))
              for p in params["layers"]]
    with torch.no_grad():
        t = torch.from_numpy(x)
        for lin in layers:
            t = lin(t)          # intentionally no ReLU between layers
        ref = torch.sigmoid(t).numpy()

    out = np.asarray(mlp.apply_radiance_mlp(params, jnp.asarray(x),
                                            activation="none"))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_softplus_beta100_high_input_stable():
    """softplus(100x)/100 must not overflow for large inputs (torch uses a
    threshold=20 linearization; jax.nn.softplus is log1p(exp) — check the
    two agree in the linear regime)."""
    x = jnp.asarray([[-1.0, 0.0, 0.5, 5.0, 50.0]])
    ours = np.asarray(jax.nn.softplus(100.0 * x) / 100.0)
    ref = torch.nn.Softplus(beta=100, threshold=20)(
        torch.tensor([[-1.0, 0.0, 0.5, 5.0, 50.0]])).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    assert np.isfinite(ours).all()
