"""Host-CPU execution for orchestration math.

The SfM orchestrator runs small pose/ray/eval computations between jitted
device phases (Camera.pose, Procrustes eval_poses, per-pair ray setup).
These are numpy-in/numpy-out and tiny — but executed eagerly on the
default backend, every primitive becomes a device dispatch, and on the
remote-TPU (axon tunnel) backend every dispatch is a ~100 ms round trip
and every new shape a remote compile. Measured effect: a 9-view scene
spent over an hour of wall-clock outside the phase timers (see
results/synthprep_full_r2.md vs its phase-timing table).

`on_host_cpu()` runs the enclosed jnp math on the host CPU backend (same
code, same numerics at f32) so the tunnel is only used for the real
jitted phase programs. The reference has no analogue — torch host math
just runs on CPU tensors (`utils/camera.py`).
"""
from __future__ import annotations

import contextlib
import functools

import jax


def _append_cpu(platforms: str | None) -> str | None:
    """New jax_platforms value that adds a host 'cpu' backend alongside a
    pinned accelerator platform; None = leave config untouched."""
    if not platforms:
        return None  # auto-detection already exposes the cpu backend
    parts = [p.strip() for p in platforms.split(",") if p.strip()]
    if "cpu" in parts:
        return None
    return ",".join(parts + ["cpu"])


def ensure_host_cpu_backend():
    """Make a host 'cpu' backend available alongside the accelerator.

    The axon environment pins JAX_PLATFORMS=axon, which hides the CPU
    client entirely; appending ',cpu' (before the first jax op) keeps the
    accelerator as the default platform while letting `on_host_cpu` place
    host math locally. Safe no-op everywhere else.
    """
    try:
        new = _append_cpu(jax.config.jax_platforms)
        if new is not None:
            jax.config.update("jax_platforms", new)
    except Exception:
        pass  # backends already initialized, or read-only config


@functools.cache
def _host_cpu_device():
    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


@contextlib.contextmanager
def on_host_cpu():
    """Run enclosed jnp math on the host CPU backend (no-op if there is
    no cpu backend, or if cpu already is the default platform)."""
    dev = _host_cpu_device()
    if dev is None or jax.default_backend() == "cpu":
        yield
        return
    with jax.default_device(dev):
        yield
