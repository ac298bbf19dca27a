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


PIPE_WORKER = textwrap.dedent("""
    import json, os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
    out = sys.argv[4]
    # same GLOBAL device count (8) in both arms: 2 procs x 4 devices vs
    # 1 proc x 8 devices -> identical sharding layout and padding shapes
    jax.config.update("jax_num_cpu_devices", 8 // n)
    if n > 1:
        jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                                   num_processes=n, process_id=pid)
    import numpy as np
    import train as train_mod

    m = train_mod.main([
        "--yaml=configs/synthetic.yaml", "--cpu", "--sfm_mode=fast",
        "--max_views=3", "--Renderer.rand_rays=480",
        "--optim.init.max_iter=20", "--optim.geoinit.max_iter=4",
        "--optim.ba.max_iter=10",
        "--parallel.data_devices=all",
        f"--output_path={out}/p{pid}"])
    r, t, ate = m.camera_set.eval_poses(verbose=False)
    digest = {
        "cam_ids": [int(c) for c in m.camera_set.cam_ids],
        "n_points": len(m.point_set),
        "rot": float(r), "t": float(t),
        "se3": np.asarray(m.camera_set.all_se3(), np.float64).tolist(),
        "xyz_mean": np.asarray(m.point_set.all_xyzs(), np.float64)
                      .mean(0).tolist(),
    }
    print("PIPE_DIGEST " + json.dumps(digest), flush=True)
""")


@pytest.mark.skipif(os.environ.get("LS2FM_SKIP_MULTIHOST") == "1",
                    reason="multihost smoke disabled")
def test_two_process_pipeline_slice(tmp_path):
    """Round-5 (VERDICT item 7): the REAL pipeline CLI (init + one
    registration + BA, 3 views) across 2 jax.distributed processes,
    asserting end-state equivalence with the single-process run at the
    same global device count. Both processes must agree bitwise (SPMD:
    identical host state, deterministic RANSAC), and the 2-process end
    state must match single-process within the 1-vs-8 test's bounds."""
    script = tmp_path / "pipe_worker.py"
    script.write_text(PIPE_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)   # worker sets its own device count

    def digest_of(out):
        line = [l for l in out.splitlines() if l.startswith("PIPE_DIGEST")][-1]
        import json
        return json.loads(line[len("PIPE_DIGEST "):])

    # 2-process arm
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", "19745",
         str(tmp_path / "mp")],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    d0, d1 = digest_of(outs[0]), digest_of(outs[1])
    assert d0 == d1, "SPMD processes diverged"

    # single-process arm (same 8 global devices)
    p = subprocess.run(
        [sys.executable, str(script), "0", "1", "19745", str(tmp_path / "sp")],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        timeout=900)
    assert p.returncode == 0, p.stdout[-3000:]
    ds = digest_of(p.stdout)

    assert d0["cam_ids"] == ds["cam_ids"] == [0, 1, 2]
    assert abs(d0["rot"] - ds["rot"]) < 4.0
    assert abs(d0["t"] - ds["t"]) < 5e-3
    assert abs(d0["n_points"] - ds["n_points"]) <= max(8, 0.15 * ds["n_points"])
    np.testing.assert_allclose(d0["se3"], ds["se3"], atol=1e-1)


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
