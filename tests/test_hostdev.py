"""Host-CPU placement of orchestration math (utils/hostdev)."""
import numpy as np

from level_s2fm_tpu.utils import hostdev


def test_append_cpu_logic():
    assert hostdev._append_cpu(None) is None
    assert hostdev._append_cpu("") is None
    assert hostdev._append_cpu("cpu") is None
    assert hostdev._append_cpu("axon") == "axon,cpu"
    assert hostdev._append_cpu("tpu") == "tpu,cpu"
    assert hostdev._append_cpu("axon,cpu") is None
    assert hostdev._append_cpu(" axon , cpu ") is None


def test_on_host_cpu_math_matches():
    """Under the tests' cpu-only config the context is a no-op; the math
    inside must still be correct and numpy-roundtrip cleanly."""
    import jax.numpy as jnp
    from level_s2fm_tpu.geometry import lie

    se3 = np.asarray([0.1, -0.2, 0.05, 0.3, 0.0, 1.5], np.float32)
    with hostdev.on_host_cpu():
        pose = np.asarray(lie.se3_to_SE3(jnp.asarray(se3[None])))[0]
    direct = np.asarray(lie.se3_to_SE3(jnp.asarray(se3[None])))[0]
    np.testing.assert_allclose(pose, direct, rtol=1e-6, atol=1e-7)
    # R orthonormal
    R = pose[:, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_on_host_cpu_places_on_cpu_device():
    import jax
    import jax.numpy as jnp

    with hostdev.on_host_cpu():
        x = jnp.ones((4,)) * 2.0
    assert "cpu" in str(list(x.devices())[0]).lower()
    assert float(x.sum()) == 8.0
