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

    # ---- a real framework phase across the 2 processes: BAPhase.step ----
    # (round-1 gap: zero level_s2fm_tpu code ran on the multi-process path)
    from level_s2fm_tpu.parallel import mesh as pmesh
    from level_s2fm_tpu.geometry import transforms as T
    from level_s2fm_tpu.sfm.phases import BAPhase, PhaseCfgs
    from level_s2fm_tpu.fields import radiance as radf, sdf as sdf_mod
    from level_s2fm_tpu.rendering import renderer as ren_mod
    from level_s2fm_tpu.config import Opt

    opt = Opt({
        "Res": 100, "Ablate_config": {"dual_field": False},
        "SDF": {"arch": {"layers": [None, 32, 16], "skip": []},
                "NN_Init": {"scale_mlp": 1, "bias": 0.5, "tf_init": True},
                "VolSDF": {"sample_intvs": 8, "final_sample_intvs": 4,
                           "volsdf_sampling": False, "max_upsample_iter": 2,
                           "iters_max_st": 4, "eps": 0.1, "beta_init": 0.05,
                           "rescale": 1.0, "beta_speed": 1.0,
                           "sdf_threshold": 1e-3},
                "Hash_config": {"n_levels": 4, "n_features_per_level": 2,
                                "log2_hashmap_size": 10, "base_resolution": 8}},
        "RadF": {"arch": {"layers": [None, 16, 16, 3], "skip": []}},
        "data": {"bound_min": [-1, -1, -1], "bound_max": [1, 1, 1],
                 "inside": True, "bg_sdf": None, "bg_rad": 2.0,
                 "scene": "mh", "bgcolor": [0, 0, 0]}})
    sdf_cfg = sdf_mod.config_from_opt(opt)
    rad_cfg = radf.config_from_opt(opt)
    ren_cfg = ren_mod.config_from_opt(opt)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"sdf": sdf_mod.init_params(k1, sdf_cfg),
              "rad": radf.init_params(k2, rad_cfg)}

    with pmesh.use_mesh(mesh):
        C, P_TRK = 2, 8
        rng2 = np.random.default_rng(1)         # same seed on every host
        cfgs = PhaseCfgs(sdf=sdf_cfg, rad=rad_cfg, ren=ren_cfg, H=8, W=8,
                         rand_rays=8)
        phase = BAPhase(cfgs, weights={"reproj_error": 0, "eikonal_loss": 2,
                                       "sdf_surf": 2}, mode="sfm", max_iter=1)
        se3 = rng2.normal(size=(C, 6)).astype(np.float32) * 0.05
        se3[:, 5] += 1.5
        ba_params = pmesh.replicate(
            {"sdf": params["sdf"], "rad": params["rad"],
             "se3_r": jnp.asarray(se3[:, :3]),
             "se3_t": jnp.asarray(se3[:, 3:])}, mesh)
        xyzs = rng2.normal(size=(P_TRK, 3)).astype(np.float32)
        xyzs = xyzs / np.linalg.norm(xyzs, axis=-1, keepdims=True) * 0.5
        pose_idx = rng2.integers(0, C, P_TRK).astype(np.int32)
        kp = rng2.uniform(0, 8, size=(P_TRK, 2)).astype(np.float32)

        def shard_rows(arr):
            sh = NamedSharding(mesh, P("data", *([None] * (arr.ndim - 1))))
            half = P_TRK // n
            local2 = arr[pid * half:(pid + 1) * half]
            return jax.make_array_from_process_local_data(sh, local2, arr.shape)

        batch = {
            "pose_idx": shard_rows(pose_idx),
            "kp": shard_rows(kp),
            "valid": shard_rows(np.ones(P_TRK, bool)),
            "intr": jax.device_put(
                jnp.asarray([[8.0, 0, 4], [0, 8.0, 4], [0, 0, 1]]),
                NamedSharding(mesh, P())),
            "images": jax.device_put(
                jnp.asarray(rng2.uniform(0.2, 0.8, (C, 64, 3)).astype(np.float32)),
                NamedSharding(mesh, P())),
            "grid": jax.device_put(jnp.asarray(np.asarray(T.mesh_grid(8, 8))),
                                   NamedSharding(mesh, P())),
            "tracing": None,
        }
        state = phase.init_state(ba_params, shard_rows(xyzs))
        new_state, metrics = phase.step(state, batch, jax.random.PRNGKey(5))
        jax.block_until_ready(new_state["params"])
        for leaf in jax.tree_util.tree_leaves(new_state["params"]):
            assert bool(jnp.isfinite(leaf).all())
        reproj = float(metrics["reproj_px"])
    print(f"MULTIHOST_BA_OK {pid} {reproj:.4f}", flush=True)
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
        assert f"MULTIHOST_BA_OK {i}" in out
    # both processes must agree on the (psum-reduced) metric
    r0 = [l for l in outs[0].splitlines() if "MULTIHOST_BA_OK" in l][0].split()[-1]
    r1 = [l for l in outs[1].splitlines() if "MULTIHOST_BA_OK" in l][0].split()[-1]
    assert abs(float(r0) - float(r1)) < 1e-4
