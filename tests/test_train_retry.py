"""Auto-retry elasticity in train.py (--auto_retry).

The reference has no failure recovery (SURVEY §5); here a transient
TPU-tunnel/worker crash re-execs the process with --resume so the run
continues from the last per-view checkpoint.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import train as train_mod
from level_s2fm_tpu.config import build_options


def test_transient_classifier():
    assert train_mod._is_transient_device_failure(
        RuntimeError("TPU worker process crashed (coredump)"))
    assert train_mod._is_transient_device_failure(
        RuntimeError("UNAVAILABLE: Socket closed"))
    assert train_mod._is_transient_device_failure(
        RuntimeError("HTTP 500 tpu_compile_helper subprocess exit code 1"))
    assert not train_mod._is_transient_device_failure(
        ValueError("bad config key optim.lr"))
    assert not train_mod._is_transient_device_failure(
        AssertionError("non-finite parameter after sharded BA step"))


def test_retry_argv_adds_resume_only_with_checkpoint():
    argv = ["--yaml=configs/synthetic.yaml", "--max_views=3"]
    assert train_mod._retry_argv(argv, ckpt_exists=False) == argv
    out = train_mod._retry_argv(argv, ckpt_exists=True)
    assert out[-1] == "--resume" and out[:-1] == argv
    # idempotent; stale --load dropped in favor of --resume
    again = train_mod._retry_argv(out, ckpt_exists=True)
    assert again.count("--resume") == 1
    out2 = train_mod._retry_argv(argv + ["--load=old.ckpt"], ckpt_exists=True)
    assert "--load=old.ckpt" not in out2 and "--resume" in out2


def test_maybe_reexec_respects_budget_and_cpu(tmp_path, monkeypatch):
    argv = ["--yaml=configs/synthetic.yaml",
            f"--output_path={tmp_path}", "--auto_retry=2"]
    opt = build_options(argv)
    exc = RuntimeError("TPU worker process crashed")
    monkeypatch.delenv("LS2FM_RETRY_ATTEMPT", raising=False)

    # no checkpoint yet -> plain restart (no --resume)
    out = train_mod._maybe_reexec_args(opt, argv, exc)
    assert out == argv and os.environ["LS2FM_RETRY_ATTEMPT"] == "1"

    # checkpoint present -> restart with --resume
    (tmp_path / "model.ckpt").write_bytes(b"x")
    out = train_mod._maybe_reexec_args(opt, argv, exc)
    assert "--resume" in out and os.environ["LS2FM_RETRY_ATTEMPT"] == "2"

    # budget exhausted
    assert train_mod._maybe_reexec_args(opt, argv, exc) is None

    # non-transient never retries
    monkeypatch.setenv("LS2FM_RETRY_ATTEMPT", "0")
    assert train_mod._maybe_reexec_args(opt, argv, ValueError("boom")) is None

    # CPU runs never retry (no tunnel to heal)
    opt_cpu = build_options(argv + ["--cpu"])
    assert train_mod._maybe_reexec_args(opt_cpu, argv, exc) is None


def test_main_reexecs_on_transient_failure(tmp_path, monkeypatch):
    """main() must re-exec (not raise) on a transient failure when
    --auto_retry is set, and raise when it is not."""
    argv = ["--yaml=configs/synthetic.yaml", f"--output_path={tmp_path}",
            "--auto_retry=1", "--max_views=2"]
    monkeypatch.delenv("LS2FM_RETRY_ATTEMPT", raising=False)

    def boom(opt, argv_, mesh_ctx):
        raise RuntimeError("TPU worker process crashed")

    calls = {}

    def fake_execv(exe, args):
        calls["exe"], calls["args"] = exe, args
        raise SystemExit(0)  # execv never returns; emulate process swap

    monkeypatch.setattr(train_mod, "_run", boom)
    monkeypatch.setattr(train_mod.os, "execv", fake_execv)
    with pytest.raises(SystemExit):
        train_mod.main(argv)
    assert calls["exe"] == sys.executable
    assert calls["args"][1].endswith("train.py")
    assert "--auto_retry=1" in calls["args"]

    # without --auto_retry the failure propagates
    monkeypatch.setenv("LS2FM_RETRY_ATTEMPT", "0")
    with pytest.raises(RuntimeError, match="TPU worker"):
        train_mod.main([a for a in argv if not a.startswith("--auto_retry")])


def test_run_refuses_silent_cpu_fallback(tmp_path, monkeypatch):
    """If the accelerator platform fails to init (default backend becomes
    cpu) a non---cpu run must abort loudly, not train on CPU silently."""
    import contextlib
    import jax
    from level_s2fm_tpu.config import build_options

    opt = build_options(["--yaml=configs/synthetic.yaml",
                         f"--output_path={tmp_path}"])
    assert not opt.get("cpu", False)
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    # an accelerator was REQUESTED (platforms "axon,cpu") but the default
    # backend resolved to cpu — the silent-fallback case the guard catches
    monkeypatch.setattr(train_mod, "_requested_platforms", lambda: "axon,cpu")
    with pytest.raises(RuntimeError, match="accelerator backend failed"):
        train_mod._run(opt, [], contextlib.nullcontext())
    # a process deliberately pinned to cpu (conftest's virtual mesh) is
    # not a failure: the guard must not fire without an accelerator ask
    monkeypatch.setattr(train_mod, "_requested_platforms", lambda: "cpu")
    opt_mesh = build_options(["--yaml=configs/synthetic.yaml", "--max_views=2",
                              f"--output_path={tmp_path}", "--sfm_mode=fast",
                              "--optim.init.max_iter=2",
                              "--optim.geoinit.max_iter=1",
                              "--optim.ba.max_iter=1"])
    model = train_mod._run(opt_mesh, [], contextlib.nullcontext())
    assert len(model.camera_set) == 2
    # explicit --cpu opts in (reaches data loading instead of the guard)
    opt_cpu = build_options(["--yaml=configs/synthetic.yaml", "--cpu",
                             f"--output_path={tmp_path}", "--max_views=2",
                             "--sfm_mode=fast", "--optim.init.max_iter=2",
                             "--optim.geoinit.max_iter=1",
                             "--optim.ba.max_iter=1"])
    model = train_mod._run(opt_cpu, [], contextlib.nullcontext())
    assert len(model.camera_set) == 2
