"""Real multi-host smoke: 2 jax.distributed CPU processes, sharded grads.

Exercises the cross-host design (SURVEY.md §2.4: batch sharded over the
global mesh, params replicated, XLA-inserted psum) with an actual
coordination service, not just virtual devices.
"""
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=n, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == n, devs
    mesh = Mesh(np.asarray(devs), ("data",))
    rng = np.random.default_rng(0)          # same seed on every host
    W = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
    X = rng.normal(size=(16, 4)).astype(np.float32)

    sharding = NamedSharding(mesh, P("data", None))
    local = X[pid * 8:(pid + 1) * 8]
    Xg = jax.make_array_from_process_local_data(sharding, local, X.shape)
    Wr = jax.device_put(W, NamedSharding(mesh, P()))

    def loss(W, x):
        return jnp.mean((x @ W) ** 2)

    g = jax.jit(jax.grad(loss))(Wr, Xg)
    g_ref = jax.grad(loss)(W, jnp.asarray(X))   # process-local reference
    err = float(jnp.abs(g - g_ref).max())
    assert err < 1e-5, err
    print(f"MULTIHOST_OK {pid} {err}", flush=True)
""")


@pytest.mark.skipif(os.environ.get("LS2FM_SKIP_MULTIHOST") == "1",
                    reason="multihost smoke disabled")
def test_two_process_sharded_grad(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = "19741"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, str(script), str(i), "2", port],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"MULTIHOST_OK {i}" in out
