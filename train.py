"""CLI entry: python train.py --yaml=configs/<cfg>.yaml [--key.sub=val ...]

Equivalent of the reference `train.py` + `utils/options.py` CLI surface:
dot-path overrides, `--flag` / `--flag!` booleans, `--resume`, `--load`,
`--get_result`. The pipeline is the incremental LevelSfM engine.
"""
from __future__ import annotations

import os
import sys


def build_var(opt):
    """Load the prepared scene (keypoints/matches/pose graph + images)."""
    dataset = opt.data.get("dataset")
    if dataset == "synthetic":
        from level_s2fm_tpu.data import synthetic
        scene = synthetic.make_scene(
            n_views=int(opt.data.get("n_views", 4)),
            H=opt.data.image_size[0], W=opt.data.image_size[1],
            n_points=int(opt.data.get("n_points", 256)),
            seed=int(opt.get("seed", 0)))
        return synthetic.scene_to_var(scene)
    from level_s2fm_tpu.data import loaders
    return loaders.load_prepared_scene(opt)


# ---------------------------------------------------------------- elasticity
# The reference has NO failure recovery (SURVEY §5: registration failure
# aborts; a CUDA fault kills the run). Long TPU runs here die for a
# different reason: the remote-TPU tunnel / worker crashes on long
# dispatches or drops mid-scene. Since the pipeline checkpoints after
# init and after EVERY registered view, a process restart with --resume
# loses at most one view of work — so train.py offers bounded automatic
# retry (--auto_retry=N, default 0/off) for transient device failures.

_TRANSIENT_PATTERNS = (
    "tpu worker process crashed", "tpu_compile_helper", "remote_compile",
    "deadline_exceeded", "unavailable", "connection reset", "socket closed",
    "failed to connect", "data_loss", "internal: stream",
)


def _is_transient_device_failure(exc: BaseException) -> bool:
    """Heuristic match on the error text: the axon PJRT surface raises
    generic XlaRuntimeError types, so the message is the only signal."""
    msg = f"{type(exc).__name__}: {exc}".lower()
    return any(p in msg for p in _TRANSIENT_PATTERNS)


def _retry_argv(argv, ckpt_exists: bool):
    """argv for the retry process: add --resume when a checkpoint exists
    (continue from the last registered view), drop a stale --load (resume
    supersedes it); without a checkpoint the run simply starts over."""
    out = [a for a in argv if not (ckpt_exists and a.startswith("--load"))]
    if ckpt_exists and "--resume" not in out:
        out.append("--resume")
    return out


def _maybe_reexec_args(opt, argv, exc):
    """Return the argv to re-exec with, or None if no retry applies."""
    budget = int(opt.get("auto_retry", 0))
    attempt = int(os.environ.get("LS2FM_RETRY_ATTEMPT", "0"))
    if budget <= attempt or opt.get("cpu", False):
        return None
    if not _is_transient_device_failure(exc):
        return None
    ckpt = os.path.join(opt.get("output_path", "output/run"), "model.ckpt")
    os.environ["LS2FM_RETRY_ATTEMPT"] = str(attempt + 1)
    return _retry_argv(list(argv), os.path.exists(ckpt))


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    from level_s2fm_tpu.config import build_options
    opt = build_options(argv)
    if opt.get("cpu", False):
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    if not opt.get("cpu", False):
        # expose a host 'cpu' backend alongside the accelerator so the
        # orchestrator's tiny eager pose/ray/eval math runs locally
        # instead of as per-primitive TPU-tunnel round trips
        from level_s2fm_tpu.utils.hostdev import ensure_host_cpu_backend
        ensure_host_cpu_backend()
    # persistent compilation cache (remote-TPU compiles cost minutes each).
    # TPU backend only: reloading CPU AOT executables across machines trips
    # XLA's machine-feature check ("could lead to execution errors such as
    # SIGILL"), and CPU compiles are cheap anyway.
    if not opt.get("cpu", False):
        try:
            jax.config.update("jax_compilation_cache_dir",
                              os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                           ".jax_cache"))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

    # --parallel.data_devices=N|all : activate an N-device ('data',) mesh;
    # phase steps shard ray/track batches over it and XLA all-reduces the
    # replicated field grads over ICI (BASELINE config 5 surface; on a
    # multi-host pod combine with parallel.distributed utilities)
    import contextlib
    mesh_ctx = contextlib.nullcontext()
    pd = opt.get("parallel", None)
    pd = pd.get("data_devices") if pd else None
    if pd:
        from level_s2fm_tpu.parallel import mesh as pmesh
        n = None if str(pd) == "all" else int(pd)
        mesh_ctx = pmesh.use_mesh(pmesh.make_mesh(n))

    os.makedirs(opt.output_path, exist_ok=True)
    from level_s2fm_tpu.config import save_options_file
    save_options_file(opt)
    try:
        return _run(opt, argv, mesh_ctx)
    except Exception as e:
        new_argv = _maybe_reexec_args(opt, argv, e)
        if new_argv is None:
            raise
        import traceback
        traceback.print_exc()
        print(f"[auto_retry] transient device failure; re-exec attempt "
              f"{os.environ['LS2FM_RETRY_ATTEMPT']}/{opt.get('auto_retry')} "
              f"with argv: {new_argv}", flush=True)
        sys.stdout.flush()
        sys.stderr.flush()
        here = os.path.abspath(__file__)
        os.execv(sys.executable, [sys.executable, here] + new_argv)


def _requested_platforms() -> str:
    """The jax_platforms config string ('' when unset/auto-detect)."""
    import jax
    try:
        return jax.config.jax_platforms or ""
    except Exception:
        return ""


def _run(opt, argv, mesh_ctx):
    import jax

    from level_s2fm_tpu.sfm.pipeline import LevelSfM
    platforms = _requested_platforms().split(",")
    accel_requested = bool(platforms[0].strip()) and platforms[0].strip() != "cpu"
    if (not opt.get("cpu", False) and accel_requested
            and jax.default_backend() == "cpu"):
        # with jax_platforms="<accel>,cpu" a failed accelerator init can
        # fall through to the cpu backend — never train there silently.
        # (A process deliberately pinned to jax_platforms="cpu" — e.g. the
        # pytest conftest's virtual 8-device mesh — is not a failure.)
        raise RuntimeError(
            "accelerator backend failed to initialize (default backend is "
            "cpu); pass --cpu to opt in to CPU training explicitly")
    with mesh_ctx:
        model = LevelSfM(opt, seed=int(opt.get("seed", 0)))
        model.load_data(build_var(opt))
        if opt.get("resume", False):
            model.restore_checkpoint()
        elif opt.get("load", None):
            model.restore_checkpoint(opt.load)
        elif opt.get("get_result", False):
            # get_result is meaningless without a checkpoint (the reference
            # gates it behind --resume, `LevelS2fM.py:185-207`); restore
            # automatically instead of failing on empty scene state
            model.restore_checkpoint()

        if opt.get("get_result", False):
            from level_s2fm_tpu.utils import export
            model._reload_scene()
            if opt.get("refine_again", None) or opt.Ablate_config.get("refine_again"):
                # long rendering-refine before export (ref `LevelS2fM.py:207-218`)
                from level_s2fm_tpu.sfm.bundle import Refiner
                refiner = Refiner(opt, model.cfgs, model.camera_set,
                                  model.point_set,
                                  max_iter=int(opt.get("refine_again_iters", 10000)))
                model.params = refiner.run(model.params, model.next_key())
                model.save_checkpoint(latest=True)
            export.export_results(opt, model)
            return model

        max_views = opt.get("max_views", None)
        model.train(max_views=int(max_views) if max_views else None)
    return model


if __name__ == "__main__":
    main()
