"""Benchmark: fwd+bwd volumetric-render training step throughput (rays/s).

Flags: --quick (small config, 1 repeat, render only), --full (reference
8192-ray batch),
--profile (write a jax.profiler trace of the measured loop),
--no-occ (disable the default occupancy-guided sample compaction and
evaluate all 128 samples, the reference's behavior),
--f32 (full-precision hash tables; default is bf16 reads + f32 accum),
--ba (neural-BA step throughput instead of the render step),
--repeats=N (timing repeats for the spread estimate; default 3),
--paired (gather dense-level corner pairs as 2-row slices; A/B candidate),
--microgather (hash-encode fwd+bwd microbench, default vs --paired path),
--scattersplit (raw gather vs scatter-add HBM bandwidth split, f32/bf16,
at the default step's row count — attributes the roofline gap),
--verify-pallas (standalone Pallas-vs-jnp-oracle allclose on the real
backend; the default bench run also performs this check and reports
"pallas_verified" in its JSON line — exit code 3 on mismatch),
--cpu (force CPU backend; for local debugging only).

Runs the flagship hot path — VolSDF render of the hash-grid SDF + radiance
fields with gradients w.r.t. all field parameters — exactly as the default
training configs run it (occupancy compaction ON, configs/levels2fm.yaml).
Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N, ...}

The default (driver) run proves its own claims (VERDICT r3 item 4):
  * N=3 timing repeats — "value" is the median, "spread_pct" the
    (max-min)/median band, so a few-% delta is classifiable vs noise;
  * "vs_baseline" is LIKE-FOR-LIKE (occ-compacted run vs the occ
    baseline key); "vs_r1_uncompacted" keeps the historical comparison
    against the round-1 non-compacted 8344 rays/s record;
  * a measured roofline: "gather_rows_per_s" (trace-counted table rows
    gathered+scattered per second) vs the ~840M rows/s XLA gather floor
    measured on the v5e ("roofline_util" = the de-facto MFU for this
    gather-bound workload);
  * "ba_iters_per_s" — the neural-BA phase number rides along in the
    same line (baseline key "ba_sfm_iters_per_s").

Baselines come from BENCH_BASELINE.json (read-only; a bench run must
never define its own baseline). If the TPU path fails the script prints
{"tpu_failed": true, ...} and exits nonzero — there is NO silent CPU
fallback.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

QUICK = "--quick" in sys.argv
CPU = "--cpu" in sys.argv

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")


def main():
    if CPU:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    # persistent compilation cache: the remote-TPU compile costs minutes
    # per program; cached executables load in seconds on re-runs. TPU
    # backend only — cross-machine CPU AOT reloads trip XLA's
    # machine-feature check ("execution errors such as SIGILL").
    if not CPU:
        try:
            jax.config.update("jax_compilation_cache_dir",
                              os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                           ".jax_cache"))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
    if not CPU:
        # Device-acquisition watchdog: a wedged axon tunnel makes
        # jax.devices() HANG (observed, not raise) — without a bound the
        # bench would burn the whole driver budget silently. Probe in a
        # daemon thread; on timeout report tpu_failed loudly and exit.
        import threading
        acquired, dev_err = [], []

        def _probe():
            try:
                acquired.append(jax.devices())
            except Exception as e:  # report the true cause, not a timeout
                dev_err.append(f"{type(e).__name__}: {e}")

        t = threading.Thread(target=_probe, daemon=True)
        t.start()
        t.join(timeout=float(os.environ.get("BENCH_DEVICE_TIMEOUT_S", "240")))
        if not acquired:
            metric = ("ba_sfm_step_iters_per_s" if "--ba" in sys.argv
                      else "render_train_step_rays_per_s")
            err = (dev_err[0] if dev_err else
                   "device acquisition timed out (TPU tunnel unreachable)")
            print(json.dumps({"metric": metric, "value": None,
                              "unit": "iters/s" if "--ba" in sys.argv else "rays/s",
                              "vs_baseline": None,
                              "tpu_failed": True, "error": err}),
                  flush=True)
            os._exit(2)
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from level_s2fm_tpu.config import Opt
    from level_s2fm_tpu.fields import radiance as radf, sdf as sdf_mod
    from level_s2fm_tpu.rendering import renderer as ren_mod

    # default sized so the remote compile stays under the driver's budget;
    # --full measures the reference's 8192-ray batch (chunked rendering)
    if QUICK:
        n_rays, sample_intvs = 1024, 64
    elif "--full" in sys.argv:
        n_rays, sample_intvs = 8192, 128
    else:
        n_rays, sample_intvs = 2048, 128

    opt = Opt({
        "Res": 100,
        "Ablate_config": {"dual_field": False},
        "SDF": {"arch": {"layers": [None, 64, 16], "skip": []},
                "NN_Init": {"scale_mlp": 1, "bias": 0.5, "tf_init": True},
                "VolSDF": {"sample_intvs": sample_intvs, "final_sample_intvs": 64,
                           "volsdf_sampling": False, "max_upsample_iter": 6,
                           "iters_max_st": 10, "eps": 0.1, "beta_init": 0.05,
                           "rescale": 1.0, "beta_speed": 1.0, "sdf_threshold": 1e-3,
                           # --reeval-compact=F: trace re-eval dedup budget
                           "reeval_compact": next(
                               (float(a.split("=")[1]) for a in sys.argv
                                if a.startswith("--reeval-compact=")), 0.0),
                           # --march-compact=F: per-step march compaction
                           "march_compact": next(
                               (float(a.split("=")[1]) for a in sys.argv
                                if a.startswith("--march-compact=")), 0.0)},
                # bf16 table reads match configs/levels2fm.yaml (f32
                # gradient accumulation; --f32 measures full-precision)
                "Hash_config": {"compute_dtype":
                                ("float32" if "--f32" in sys.argv
                                 else "bfloat16"),
                                "paired_dense": "--paired" in sys.argv}},
        "RadF": {"arch": {"layers": [None, 64, 64, 3], "skip": []}},
        "data": {"bound_min": [-1, -1, -1], "bound_max": [1, 1, 1],
                 "inside": True, "bg_sdf": None, "bg_rad": 2.0,
                 "scene": "bench", "bgcolor": [0, 0, 0]},
    })
    sdf_cfg = sdf_mod.config_from_opt(opt)
    rad_cfg = radf.config_from_opt(opt)
    ren_cfg = ren_mod.config_from_opt(opt)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {"sdf": sdf_mod.init_params(k1, sdf_cfg),
              "rad": radf.init_params(k2, rad_cfg)}

    rng = np.random.default_rng(0)
    center = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -2.0]), (1, n_rays, 3))
    ray = jnp.asarray(np.concatenate(
        [rng.normal(size=(1, n_rays, 2)) * 0.15, np.ones((1, n_rays, 1))],
        axis=-1).astype(np.float32))
    rgb_gt = jnp.asarray(rng.uniform(0, 1, size=(1, n_rays, 3)).astype(np.float32))

    if "--microgather" in sys.argv:
        bench_microgather(sdf_cfg, params, QUICK)
        return

    if "--verify-pallas" in sys.argv:
        ok, detail = verify_pallas(verbose=True)
        print(json.dumps({"metric": "pallas_composite_verify",
                          "value": 1.0 if ok else 0.0, "unit": "bool",
                          "vs_baseline": None, **detail}))
        sys.exit(0 if ok else 3)

    if "--ba" in sys.argv:
        print(json.dumps(measure_ba(opt, sdf_cfg, rad_cfg, ren_cfg, params,
                                    QUICK)))
        return

    if "--ba-bisect" in sys.argv:
        bench_ba_bisect(sdf_cfg, params, QUICK,
                        rad_cfg=rad_cfg, ren_cfg=ren_cfg)
        return

    if "--scattersplit" in sys.argv:
        bench_scattersplit(sdf_cfg, params, QUICK)
        return

    if "--trace" in sys.argv:
        measure_trace(sdf_cfg, params, n_rays, QUICK)
        return

    # occupancy compaction is the DEFAULT (matches configs/levels2fm.yaml);
    # --no-occ measures the uncompacted reference-equivalent path
    occ_grid = None
    occ_tag = ""
    if "--no-occ" not in sys.argv:
        import dataclasses
        from level_s2fm_tpu.fields import sdf as _sdf
        from level_s2fm_tpu.rendering import raymarch as _rm
        occ_grid = _rm.build_occupancy_grid(
            lambda p: _sdf.infer_sdf(params["sdf"], sdf_cfg, p),
            jnp.zeros(3), jnp.ones(3), resolution=64, threshold=0.25,
            one_sided=True)
        ren_cfg = dataclasses.replace(ren_cfg,
                                      compact_samples=max(sample_intvs // 4, 16))
        occ_tag = "_occ"

    def loss_fn(params):
        out = ren_mod.render(params["sdf"], sdf_cfg, params["rad"], rad_cfg,
                             ren_cfg, center, ray, occ_grid=occ_grid)
        n = jnp.linalg.norm(out["normals"], axis=-1)
        return (jnp.mean(jnp.abs(out["rgb"] - rgb_gt))
                + 0.1 * jnp.mean(jnp.abs(n - 1.0)))

    iters = 3 if QUICK else 10

    @jax.jit
    def run_steps(params):
        # scan the steps inside one device program so the measurement is
        # device throughput, not host->device dispatch latency (the axon
        # tunnel adds ~100ms+ per call)
        def body(acc, _):
            val, grads = jax.value_and_grad(loss_fn)(params)
            gnorm = sum(jnp.sum(jnp.abs(g))
                        for g in jax.tree_util.tree_leaves(grads))
            return acc + val + 1e-12 * gnorm, None

        acc, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return acc

    # trace-time roofline accounting: count the table rows the compiled
    # step gathers (fwd) and scatters (tangent/cotangent) per iteration.
    # Lowering traces without compiling, so this costs seconds.
    from level_s2fm_tpu.fields import hashgrid as _hg
    rows_per_iter = None
    try:
        _hg.TRACE_ROWS = {"fwd": 0, "tangent": 0}
        jax.jit(lambda p: jax.value_and_grad(loss_fn)(p)).lower(params)
        rows_per_iter = _hg.TRACE_ROWS["fwd"] + _hg.TRACE_ROWS["tangent"]
        rows_fwd = _hg.TRACE_ROWS["fwd"]
        # per-call-site attribution (march / trace_reeval / render_eval /
        # surface_project ...): fraction of all rows each consumer moves
        rows_by_site = {
            k.split(":")[0]: round(
                sum(v for kk, v in _hg.TRACE_ROWS.items()
                    if kk.startswith(k.split(":")[0] + ":")) / rows_per_iter,
                3)
            for k in _hg.TRACE_ROWS if ":" in k} if rows_per_iter else {}
    finally:
        _hg.TRACE_ROWS = None

    # compile + warmup; the remote compile helper fails transiently when
    # the terminal is busy/restarting — retry once
    for attempt in range(3):
        try:
            out = run_steps(params)
            jax.block_until_ready(out)
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(30)
    if "--profile" in sys.argv:
        # one traced run for kernel-level analysis; view with
        # tensorboard --logdir <dir> (trace_viewer) or xprof
        trace_dir = os.environ.get("BENCH_TRACE_DIR", "/tmp/ls2fm_trace")
        with jax.profiler.trace(trace_dir):
            jax.block_until_ready(run_steps(params))
        print(f"# profiler trace written to {trace_dir}", file=sys.stderr)

    # N timing repeats -> median + spread, so a few-% round-over-round
    # delta is classifiable as regression vs tunnel noise (VERDICT r3)
    repeats = 1 if QUICK else 3
    for a in sys.argv:
        if a.startswith("--repeats="):
            repeats = max(int(a.split("=")[1]), 1)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run_steps(params)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]          # median
    spread_pct = ((max(times) - min(times)) / dt * 100.0
                  if len(times) > 1 else None)
    rays_per_s = n_rays * iters / dt

    # baselines (BENCH_BASELINE.json is READ-ONLY here: a bench run must
    # never define its own baseline). vs_baseline is LIKE-FOR-LIKE: the
    # occ-compacted default path compares against the _occ baseline key;
    # vs_r1_uncompacted keeps the historical round-1 comparison.
    record = {}
    if os.path.exists(BASELINE_FILE):
        try:
            with open(BASELINE_FILE) as f:
                record = json.load(f)
        except Exception:
            record = {}
    cfg_key = (f"rays_per_s_{n_rays}x{sample_intvs}" + occ_tag
               + ("_cpu" if CPU else ""))
    baseline = record.get(cfg_key)
    r1_key = f"rays_per_s_{n_rays}x{sample_intvs}" + ("_cpu" if CPU else "")
    r1_baseline = record.get(r1_key) if occ_tag else None

    # on-chip guard for the Pallas composite kernel (VERDICT r2 item 6):
    # the test suite can only exercise the interpreter/jnp oracle on CPU,
    # so the bench certifies the real Mosaic kernel against the oracle on
    # every driver run. Skipped on --cpu (no Mosaic lowering there).
    extra = {}
    if not CPU:
        try:
            ok, detail = verify_pallas(verbose=False)
            extra = {"pallas_verified": bool(ok),
                     "pallas_max_err": detail["max_err"]}
        except Exception as e:  # a broken kernel must be loud, not fatal
            extra = {"pallas_verified": False, "pallas_error": str(e)}

    # measured roofline: achieved gather+scatter table rows/s vs the
    # ~840M rows/s XLA gather floor measured on the v5e (docs/PERF.md) —
    # the de-facto MFU for this gather-bound workload
    if rows_per_iter:
        rows_per_s = rows_per_iter * iters / dt
        floor = float(os.environ.get("BENCH_GATHER_FLOOR", "840e6"))
        extra.update(
            gather_rows_per_iter=rows_per_iter,
            gather_rows_fwd_frac=round(rows_fwd / rows_per_iter, 3),
            gather_rows_per_s=round(rows_per_s / 1e6, 1),
            gather_rows_unit="Mrows/s (fwd gathers + bwd scatters)",
            gather_rows_by_site=rows_by_site,
            roofline_util=None if CPU else round(rows_per_s / floor, 3))

    # BA-phase throughput rides along in the default driver run
    # (VERDICT r3 item 4a); --quick skips it to stay fast
    if not QUICK:
        try:
            ba = measure_ba(opt, sdf_cfg, rad_cfg, ren_cfg, params, quick=False)
            extra.update(ba_iters_per_s=ba["value"],
                         ba_vs_baseline=ba["vs_baseline"])
        except Exception as e:  # the render number must still be reported
            extra.update(ba_iters_per_s=None,
                         ba_error=f"{type(e).__name__}: {e}"[:200])

    print(json.dumps({
        "metric": "render_train_step_rays_per_s",
        "value": round(rays_per_s, 1),
        "unit": "rays/s" + (" (cpu)" if CPU else "") + (occ_tag and " (occ-compacted default path)"),
        "vs_baseline": round(rays_per_s / baseline, 3) if baseline else None,
        "baseline_key": cfg_key,
        "repeats": repeats,
        "spread_pct": round(spread_pct, 2) if spread_pct is not None else None,
        "vs_r1_uncompacted": (round(rays_per_s / r1_baseline, 3)
                              if r1_baseline else None),
        **extra,
    }))


def verify_pallas(verbose: bool = False, atol: float = 2e-4):
    """Pallas Mosaic kernel vs jnp oracle, ON the real backend: forward
    outputs and the full VJP of `laplace_composite` must agree at the
    production shapes (K=32 compacted / K=128 full). Returns
    (ok, {"max_err": float, ...}).

    Why it exists: tests run the kernel in interpreter mode
    (`rendering/pallas_composite.py` INTERPRET), so a Mosaic toolchain
    regression would pass the suite while corrupting on-chip training —
    this runs in every driver bench so BENCH_r*.json certifies kernel
    correctness alongside speed."""
    import jax
    import jax.numpy as jnp
    from level_s2fm_tpu.rendering import pallas_composite as pc

    if jax.default_backend() == "cpu":
        # no Mosaic on CPU: fall back to the interpreter so the code path
        # stays drivable locally (same oracle the test suite pins)
        pc.INTERPRET = True

    rng = np.random.default_rng(7)
    worst = 0.0
    per_case = {}
    for K in (32, 128):
        R = 512
        sdf = jnp.asarray(rng.normal(size=(R, K)).astype(np.float32) * 0.2)
        valid = jnp.asarray((rng.uniform(size=(R, K)) > 0.2)
                            .astype(np.float32))
        delta = jnp.asarray(rng.uniform(0.005, 0.05, size=(R, K))
                            .astype(np.float32))
        rgb = jnp.asarray(rng.uniform(size=(3, R, K)).astype(np.float32))
        depth = jnp.asarray(rng.uniform(0.5, 3.0, size=(R, K))
                            .astype(np.float32))
        normal = jnp.asarray(rng.normal(size=(3, R, K)).astype(np.float32))
        alpha = jnp.asarray(20.0)
        beta = jnp.asarray(0.05)
        args = (sdf, valid, delta, rgb, depth, normal, alpha, beta)

        def scalar_loss(use_pallas, *a):
            outs = pc.laplace_composite(*a, use_pallas)
            # weighted sum touches every output channel
            ws = [1.0, 0.7, 0.3, 1.3]
            return sum(w * jnp.sum(jnp.sin(o * 0.7)) for w, o in zip(ws, outs))

        f_pal = jax.jit(lambda *a: pc.laplace_composite(*a, True))
        f_jnp = jax.jit(lambda *a: pc.laplace_composite(*a, False))
        out_p = jax.block_until_ready(f_pal(*args))
        out_j = jax.block_until_ready(f_jnp(*args))
        fwd_err = max(float(jnp.max(jnp.abs(p - j)))
                      for p, j in zip(out_p, out_j))

        g_pal = jax.jit(jax.grad(lambda *a: scalar_loss(True, *a),
                                 argnums=tuple(range(8))))(*args)
        g_jnp = jax.jit(jax.grad(lambda *a: scalar_loss(False, *a),
                                 argnums=tuple(range(8))))(*args)
        # normalize the scalar (alpha, beta) grads by magnitude — they are
        # O(R*K) sums, so compare relatively
        bwd_errs = []
        for i, (p, j) in enumerate(zip(g_pal, g_jnp)):
            scale = max(float(jnp.max(jnp.abs(j))), 1.0)
            bwd_errs.append(float(jnp.max(jnp.abs(p - j))) / scale)
        bwd_err = max(bwd_errs)
        per_case[f"K{K}"] = {"fwd": round(fwd_err, 8), "bwd": round(bwd_err, 8)}
        worst = max(worst, fwd_err, bwd_err)
        if verbose:
            print(f"# verify-pallas K={K}: fwd_max_err={fwd_err:.3e} "
                  f"bwd_max_rel_err={bwd_err:.3e}", file=sys.stderr)
    return worst < atol, {"max_err": round(worst, 8), "cases": per_case,
                          "atol": atol}


def bench_microgather(sdf_cfg, params, quick):
    """Hash-encode fwd+bwd microbenchmark: default row gather vs the
    paired dense-level gather (HashGridConfig.paired_dense), same table.
    Manual A/B harness — prints one JSON line with both timings."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from level_s2fm_tpu.fields import hashgrid

    cfg = sdf_cfg.grid
    table = params["sdf"]["table"]
    N = 8192 if quick else 65536
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, size=(N, 3)).astype(np.float32))
    cot = jnp.asarray(np.random.default_rng(1).normal(
        size=(N, cfg.n_levels * cfg.n_features_per_level)).astype(np.float32))
    iters = 3 if quick else 20

    def time_mode(c):
        def loss(t):
            enc, denc = hashgrid.encode_with_grad(t, x, c)
            return jnp.sum(enc * cot) + 1e-3 * jnp.sum(denc)

        @jax.jit
        def steps(t):
            def body(acc, _):
                v, g = jax.value_and_grad(loss)(t)
                return acc + v + 1e-12 * jnp.sum(jnp.abs(g)), None
            acc, _ = jax.lax.scan(body, 0.0, None, length=iters)
            return acc

        jax.block_until_ready(steps(table))
        t0 = time.perf_counter()
        jax.block_until_ready(steps(table))
        return (time.perf_counter() - t0) / iters * 1e3  # ms/iter

    ms_default = time_mode(dataclasses.replace(cfg, paired_dense=False))
    ms_paired = time_mode(dataclasses.replace(cfg, paired_dense=True))
    print(json.dumps({
        "metric": "hash_encode_fwd_bwd_ms",
        "value": round(ms_paired, 3),
        "unit": f"ms/iter (N={N}, paired_dense)",
        "vs_baseline": round(ms_default / ms_paired, 3),
        "default_ms": round(ms_default, 3),
        "n_dense_levels": cfg.n_dense_levels,
    }))


def bench_scattersplit(sdf_cfg, params, quick):
    """Raw HBM bandwidth split of the two ops that bound the render step:
    the flat table-row GATHER (forward encode) and the flat scalar
    SCATTER-ADD (the table-cotangent accumulation, i.e. the transpose of
    `hashgrid._table_gather`'s tangent). Times each in isolation, f32 and
    bf16, at exactly the default bench step's row count (2048 rays x 32
    compacted samples x 16 levels x 8 corners = 8.4M rows/iter), plus the
    real encode fwd-only vs fwd+bwd pair. Run on chip to attribute the
    gap between the measured step and the 840M rows/s gather floor
    (VERDICT r4 item 7: "push past 70k rays/s or document the wall")."""
    import jax
    import jax.numpy as jnp

    cfg = sdf_cfg.grid
    table = params["sdf"]["table"]
    L, T, F = table.shape
    N = 8192 if quick else 65536           # points/iter (2048 rays x 32)
    rows = N * L * 8                       # gathered/scattered rows/iter
    iters = 3 if quick else 10
    rng = np.random.default_rng(0)
    # per-level indices like the real encode: uniform over each level's
    # occupied range (dense prefix for coarse levels, full table for fine)
    res = cfg.resolutions()
    lvl_sizes = np.minimum((res + 1).astype(np.int64) ** 3, T)
    gi = np.concatenate([
        rng.integers(0, lvl_sizes[l], size=N * 8) + l * T
        for l in range(L)]).astype(np.int32)
    gi = jnp.asarray(gi)                   # [rows]
    vals = jnp.asarray(rng.normal(size=(rows, F)).astype(np.float32))

    def timed(fn, *args):
        @jax.jit
        def steps(*a):
            def body(acc, _):
                return acc + fn(*a), None
            acc, _ = jax.lax.scan(body, 0.0, None, length=iters)
            return acc
        jax.block_until_ready(steps(*args))
        t0 = time.perf_counter()
        jax.block_until_ready(steps(*args))
        return (time.perf_counter() - t0) / iters * 1e3  # ms/iter

    out = {}
    flat32 = table.reshape(L * T, F)
    flat16 = flat32.astype(jnp.bfloat16)
    # 1. row gather (the encode's forward form)
    out["gather_f32_ms"] = timed(
        lambda t, i: jnp.sum(t[i].astype(jnp.float32)), flat32, gi)
    out["gather_bf16_ms"] = timed(
        lambda t, i: jnp.sum(t[i].astype(jnp.float32)), flat16, gi)
    # 2. flat scalar scatter-add (the cotangent's exact lowered form:
    #    [rows*F] values into a [L*T*F] 1-D buffer)
    sidx = (gi[:, None] * F + jnp.arange(F, dtype=gi.dtype)[None, :]).reshape(-1)

    def scat(buf, v):
        return jnp.sum(buf.at[sidx].add(
            v, mode="promise_in_bounds")[:128].astype(jnp.float32))

    out["scatter_f32_ms"] = timed(scat, jnp.zeros(L * T * F, jnp.float32),
                                  vals.reshape(-1))
    out["scatter_bf16_ms"] = timed(scat, jnp.zeros(L * T * F, jnp.bfloat16),
                                   vals.reshape(-1).astype(jnp.bfloat16))
    # 2b. the sort+segment-sum alternative to the random scatter-add:
    #    sort (idx, val) pairs, then scatter the sorted runs (XLA lowers
    #    sorted-unique-ish scatters better when collisions are adjacent).
    #    If sort_scatter beats scatter_f32, a sorted cotangent path is a
    #    candidate optimization; if jnp.sort alone costs more than the
    #    scatter, the wall is documented.
    v1 = vals.reshape(-1)

    def sort_scat(buf, v):
        order = jnp.argsort(sidx)
        si, sv = sidx[order], v[order]
        return jnp.sum(buf.at[si].add(
            sv, mode="promise_in_bounds")[:128].astype(jnp.float32))

    out["sort_scatter_f32_ms"] = timed(
        sort_scat, jnp.zeros(L * T * F, jnp.float32), v1)
    out["argsort_only_ms"] = timed(lambda v: jnp.sum(jnp.argsort(v)
                                                     .astype(jnp.float32)
                                                     [:4]), sidx)
    # 3. the real op: encode fwd only vs fwd+bwd (param cotangent)
    from level_s2fm_tpu.fields import hashgrid
    x = jnp.asarray(rng.uniform(0, 1, size=(N, 3)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(N, L * F)).astype(np.float32))
    out["encode_fwd_ms"] = timed(
        lambda t: jnp.sum(hashgrid.encode(t, x, cfg) * cot), table)
    out["encode_fwdbwd_ms"] = timed(
        lambda t: jnp.sum(jnp.abs(jax.grad(
            lambda tt: jnp.sum(hashgrid.encode(tt, x, cfg) * cot))(t))),
        table)
    mrows = rows / 1e6
    print(json.dumps({
        "metric": "scatter_gather_split",
        "value": round(out["scatter_f32_ms"], 2),
        "unit": f"ms/iter ({mrows:.1f}M rows, N={N})",
        "vs_baseline": None,
        **{k: round(v, 2) for k, v in out.items()},
        **{k.replace("_ms", "_mrows_per_s"): round(mrows / (v / 1e3), 1)
           for k, v in out.items() if not k.startswith("encode")},
    }))


def bench_ba_bisect(sdf_cfg, params, quick, rad_cfg=None, ren_cfg=None):
    """Bisect the BA-sfm step cost: time scanned fwd+bwd loops of each
    component in isolation (P track points, grads to the SDF params).
    Prints one JSON line with ms/iter per component — run on chip to find
    where the ~10 iters/s BA step actually spends its time (VERDICT r4
    item 7 groundwork)."""
    import jax
    import jax.numpy as jnp
    from level_s2fm_tpu.fields import sdf as sdf_mod
    from level_s2fm_tpu.sfm import optim as optim_mod
    import optax

    P = 1024 if quick else 8192
    iters = 3 if quick else 10
    rng = np.random.default_rng(0)
    xyzs = rng.normal(size=(P, 3)).astype(np.float32)
    xyzs /= np.linalg.norm(xyzs, axis=-1, keepdims=True) * 2.0
    xyzs = jnp.asarray(xyzs)
    p_sdf = params["sdf"]

    def timed(loss_fn, p):
        @jax.jit
        def steps(p):
            def body(acc, _):
                v, g = jax.value_and_grad(loss_fn)(p)
                return acc + v + 1e-12 * sum(jnp.sum(jnp.abs(x))
                                             for x in jax.tree.leaves(g)), None
            acc, _ = jax.lax.scan(body, 0.0, None, length=iters)
            return acc
        jax.block_until_ready(steps(p))
        t0 = time.perf_counter()
        jax.block_until_ready(steps(p))
        return (time.perf_counter() - t0) / iters * 1e3

    out = {}
    # C: one plain SDF eval (1 gather pass fwd, 1 scatter bwd)
    out["infer_sdf_ms"] = timed(
        lambda p: jnp.sum(jnp.abs(sdf_mod.infer_sdf(p, sdf_cfg, xyzs))), p_sdf)
    # D: fused sdf+normal eval (the get_surface_pts inner op)
    def loss_normal(p):
        s, n = sdf_mod.infer_with_normal_chunked(p, sdf_cfg, xyzs)
        return jnp.sum(jnp.abs(s)) + jnp.sum(jnp.abs(n))
    out["infer_with_normal_ms"] = timed(loss_normal, p_sdf)
    # B: full surface projection + re-eval (the BA per-iter field math)
    def loss_surf(p):
        x_new, nval = sdf_mod.get_surface_pts(p, sdf_cfg, xyzs)
        s = sdf_mod.infer_sdf(p, sdf_cfg, x_new)
        return (jnp.sum(jnp.abs(s)) + jnp.sum(jnp.abs(x_new))
                + jnp.sum(jnp.abs(nval - 1.0)))
    out["surface_project_ms"] = timed(loss_surf, p_sdf)
    # E: optimizer-only — adam_stacked update on the full param tree with
    # a constant gradient (isolates the table/moment update HBM cost)
    tx = optim_mod.adam_stacked(1e-3)
    ones_g = jax.tree.map(jnp.ones_like, p_sdf)
    opt0 = tx.init(p_sdf)

    @jax.jit
    def opt_steps(p, o):
        def body(carry, _):
            p, o = carry
            u, o = tx.update(ones_g, o, p)
            return (optax.apply_updates(p, u), o), None
        (p, o), _ = jax.lax.scan(body, (p, o), None, length=iters)
        return p, o
    jax.block_until_ready(opt_steps(p_sdf, opt0))
    t0 = time.perf_counter()
    jax.block_until_ready(opt_steps(p_sdf, opt0))
    out["adam_table_update_ms"] = (time.perf_counter() - t0) / iters * 1e3

    # F/G/H (round 5): account the FULL real BAPhase step against its
    # parts — losses fwd+bwd alone, one step with update, and the scanned
    # step loop. Closes the r4 gap: components A-E summed to ~34 ms vs
    # ~102 ms/iter measured on the real step; these rows say where the
    # rest lives (losses-vs-update split, scan/carry overhead).
    if rad_cfg is not None and ren_cfg is not None:
        phase, state, batch, P_real, _C = _build_ba_setup(
            sdf_cfg, rad_cfg, ren_cfg, params, quick)
        key = jax.random.PRNGKey(0)

        def losses_total(p):
            loss, metrics, _x = phase._losses(p, state["xyzs"], batch, key)
            return sum(jnp.sum(v) for v in loss.values())

        out["real_losses_fwdbwd_ms"] = timed(losses_total, state["params"])

        # full jitted step (losses + guarded_update + carry), scanned
        @jax.jit
        def steps(st):
            def body(s, k):
                s2, _m = phase._step_impl(s, batch, k)
                return s2, None
            s2, _ = jax.lax.scan(body, st, jax.random.split(key, iters))
            return s2
        jax.block_until_ready(steps(state)["params"])
        t0 = time.perf_counter()
        jax.block_until_ready(steps(state)["params"])
        out["real_step_total_ms"] = (time.perf_counter() - t0) / iters * 1e3
        out["real_update_overhead_ms"] = (out["real_step_total_ms"]
                                          - out["real_losses_fwdbwd_ms"])
    print(json.dumps({
        "metric": "ba_bisect_ms_per_iter",
        "value": round(out["surface_project_ms"], 2),
        "unit": f"ms/iter (P={P})",
        "vs_baseline": None,
        **{k: round(v, 2) for k, v in out.items()},
    }))


def measure_trace(sdf_cfg, params, n_rays, quick):
    """Sphere-tracing throughput (rays/s, fwd+bwd through the re-eval) —
    the hot path of the DC loss and geoinit triangulation, and the one
    the march early-exit (`sdf.sphere_march` lax.cond gating) actually
    accelerates: the driver's render-step metric contains NO march, so
    march optimizations must be claimed against THIS number, not that
    one. Also prints the trace-time row split (march vs re-eval); note
    the march rows are the static fixed-trip upper bound — early-exited
    iterations still count at trace time."""
    import jax
    import jax.numpy as jnp
    from level_s2fm_tpu.fields import hashgrid as _hg
    from level_s2fm_tpu.fields import sdf as sdf_mod

    rng = np.random.default_rng(0)
    ray0 = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -2.0]), (n_rays, 3))
    ray_d = np.concatenate(
        [rng.normal(size=(n_rays, 2)) * 0.15, np.ones((n_rays, 1))],
        axis=-1).astype(np.float32)
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    ray_d = jnp.asarray(ray_d)
    iters = 3 if quick else 10

    def loss_fn(p):
        tr = sdf_mod.sphere_tracing(p["sdf"], sdf_cfg, ray0[None],
                                    ray_d[None], key=jax.random.PRNGKey(0))
        return (jnp.sum(jnp.abs(tr.d_pred)) * 1e-3
                + jnp.sum(jnp.abs(tr.sdf_surf)))

    @jax.jit
    def run_steps(p):
        def body(acc, _):
            v, g = jax.value_and_grad(loss_fn)(p)
            return acc + v + 1e-12 * sum(jnp.sum(jnp.abs(x))
                                         for x in jax.tree.leaves(g)), None
        acc, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return acc

    rows_by_site, rows_per_iter = {}, None
    try:
        _hg.TRACE_ROWS = {"fwd": 0, "tangent": 0}
        jax.jit(lambda p: jax.value_and_grad(loss_fn)(p)).lower(params)
        rows_per_iter = _hg.TRACE_ROWS["fwd"] + _hg.TRACE_ROWS["tangent"]
        sites = {k.split(":")[0] for k in _hg.TRACE_ROWS if ":" in k}
        rows_by_site = {
            s: round(sum(v for kk, v in _hg.TRACE_ROWS.items()
                         if kk.startswith(s + ":")) / max(rows_per_iter, 1),
                     3)
            for s in sites}
    finally:
        _hg.TRACE_ROWS = None

    jax.block_until_ready(run_steps(params))
    t0 = time.perf_counter()
    jax.block_until_ready(run_steps(params))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "sphere_trace_rays_per_s",
        "value": round(n_rays * iters / dt, 1),
        "unit": f"rays/s (fwd+bwd, iters_max={sdf_cfg.iters_max})",
        "vs_baseline": None,
        "static_rows_per_iter": rows_per_iter,
        "rows_by_site": rows_by_site,
    }))


def _build_ba_setup(sdf_cfg, rad_cfg, ren_cfg, params, quick):
    """(phase, state, batch) for the sfm-mode BA step benches — shared by
    measure_ba (throughput) and bench_ba_bisect (component accounting)."""
    import jax.numpy as jnp
    from level_s2fm_tpu.geometry import transforms as T
    from level_s2fm_tpu.sfm.phases import BAPhase, PhaseCfgs

    P = 1024 if quick else 8192
    C = 8
    HW = 64 * 64
    rng = np.random.default_rng(0)
    cfgs = PhaseCfgs(sdf=sdf_cfg, rad=rad_cfg, ren=ren_cfg, H=64, W=64,
                     rand_rays=2048)
    phase = BAPhase(cfgs, weights={"reproj_error": 0, "eikonal_loss": 2,
                                   "sdf_surf": 2}, mode="sfm", max_iter=1)
    se3 = rng.normal(size=(C, 6)).astype(np.float32) * 0.05
    se3[:, 5] += 2.0
    ba_params = {"sdf": params["sdf"], "rad": params["rad"],
                 "se3_r": jnp.asarray(se3[:, :3]),
                 "se3_t": jnp.asarray(se3[:, 3:])}
    xyzs = rng.normal(size=(P, 3)).astype(np.float32)
    xyzs /= np.linalg.norm(xyzs, axis=-1, keepdims=True) * 2.0  # on init sphere
    batch = {
        "pose_idx": jnp.asarray(rng.integers(0, C, P).astype(np.int32)),
        "kp": jnp.asarray(rng.uniform(0, 64, size=(P, 2)).astype(np.float32)),
        "valid": jnp.ones(P, bool),
        "intr": jnp.asarray([[64.0, 0, 32], [0, 64.0, 32], [0, 0, 1]]),
        "images": jnp.asarray(rng.uniform(0, 1, (C, HW, 3)).astype(np.float32)),
        "grid": T.mesh_grid(64, 64),
        "tracing": None,
    }
    state = phase.init_state(ba_params, jnp.asarray(xyzs))
    return phase, state, batch, P, C


def measure_ba(opt, sdf_cfg, rad_cfg, ren_cfg, params, quick):
    """Neural-BA step throughput (track observations/s), sfm mode.
    Returns the result dict (printed by --ba, merged into the default
    driver line otherwise)."""
    import jax

    phase, state, batch, P, C = _build_ba_setup(sdf_cfg, rad_cfg, ren_cfg,
                                                params, quick)
    iters = 3 if quick else 10
    state, _ = phase.run(state, batch, jax.random.PRNGKey(0), n_iters=iters)
    jax.block_until_ready(state["params"])
    t0 = time.perf_counter()
    state, _ = phase.run(state, batch, jax.random.PRNGKey(1), n_iters=iters)
    jax.block_until_ready(state["params"])
    dt = time.perf_counter() - t0
    iters_per_s = iters / dt
    # baseline: BENCH_BASELINE.json's "ba_sfm_iters_per_s" (6.56 iters/s,
    # measured on chip early round 2 before the lane-packed table-gradient
    # path landed — round 1 had no BA bench; see the file's _note_ba).
    # null if the key is absent.
    baseline = None
    if os.path.exists(BASELINE_FILE):
        try:
            with open(BASELINE_FILE) as f:
                baseline = json.load(f).get("ba_sfm_iters_per_s")
        except Exception:
            baseline = None
    return {
        "metric": "ba_sfm_step_iters_per_s",
        "value": round(iters_per_s, 2),
        "unit": f"iters/s (P={P} tracks, C={C} cams)",
        "vs_baseline": (round(iters_per_s / baseline, 3) if baseline else None),
    }


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        # LOUD failure: a perf-gated project must not have a bench that
        # degrades to green (round-1 lesson — the silent CPU fallback hid
        # a TPU failure). Emit a machine-readable failure record and exit
        # nonzero so the driver records the miss.
        import traceback
        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "render_train_step_rays_per_s",
            "value": None,
            "unit": "rays/s",
            "vs_baseline": None,
            "tpu_failed": not CPU,
            "error": f"{type(e).__name__}: {e}"[:300],
        }))
        sys.exit(2)
