"""REAL 2-process multi-host training tests (gloo CPU collectives).

Round-2 VERDICT item 4 wired multi-host into ``train.py`` but could only
prove it degenerate (single-process).  These tests launch TWO actual
``jax.distributed`` processes — 4 virtual CPU devices each, gloo
cross-process collectives standing in for DCN (SURVEY.md §2.9) — and
check:

* the shard_map fused train step fed through the real multi-host input
  path (``process_batch_slice`` + ``globalize_batch``) produces the SAME
  loss trajectory and parameters as this (single-process, 8-device)
  session running the identical computation, and
* the real ``train.main`` CLI completes a 2-process run end-to-end —
  per-process loader slices, globalized batches, padded+sliced
  validation — with checkpoint/stats writes guarded to process 0.

Subprocess entry point: ``tests/multihost_runner.py``.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import yaml

# smoke-excluded: minutes-scale on the 1-core box (see tests/conftest.py)
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch_pair_once(phase, extra_args, timeout):
    """Run two runner processes (4 CPU devices each) to completion.

    Both stdout pipes are drained concurrently (a blocked/full pipe on one
    rank must not deadlock the other), and ALL processes are killed on any
    failure path — a surviving gloo peer stuck in a collective would
    otherwise linger for the full distributed timeout and starve the rest
    of the suite on this 1-core box.
    """
    import threading

    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("PYTHONPATH", None)  # breaks plugin registration (CLAUDE.md)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tests.multihost_runner",
             phase, str(pid), str(port)] + [str(a) for a in extra_args],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [None, None]

    def drain(pid):
        outs[pid] = procs[pid].stdout.read()
        procs[pid].wait()

    threads = [
        threading.Thread(target=drain, args=(pid,), daemon=True)
        for pid in (0, 1)
    ]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=timeout)
        if any(t.is_alive() for t in threads):
            raise subprocess.TimeoutExpired(procs[0].args, timeout)
        for pid, p in enumerate(procs):
            assert p.returncode == 0, (
                f"process {pid} failed (rc={p.returncode}):\n"
                f"{(outs[pid] or '')[-4000:]}"
            )
    finally:
        for q in procs:
            if q.poll() is None:
                q.kill()
    return outs


def _launch_pair(phase, extra_args, timeout=1800):
    """_launch_pair_once with ONE retry on a coordinator port collision:
    _free_port() closes its probe socket before jax.distributed binds it
    (TOCTOU), so a concurrent process can steal the port — a rare flake
    that should fail fast and retry on a fresh port, not hang."""
    try:
        return _launch_pair_once(phase, extra_args, timeout)
    except AssertionError as e:
        text = str(e)
        bindish = any(
            s in text.lower()
            for s in ("bind", "address already in use", "unavailable")
        )
        if not bindish:
            raise
        return _launch_pair_once(phase, extra_args, timeout)


def _single_process_reference():
    """The same 3-step computation the runners perform, on this session's
    8 virtual devices (single process); ``globalize_batch`` degenerates to
    a plain shard when process_count()==1."""
    import jax
    import jax.numpy as jnp

    from nsdp_tpu.models import build_model
    from nsdp_tpu.parallel import globalize_batch, make_mesh, replicate
    from nsdp_tpu.training import (
        create_train_state, make_steps, optimizer_factory,
    )
    from tests.test_parallel import TINY, _batch

    cfg = {"model": dict(TINY["model"], fused_attention=True)}
    model = build_model(cfg)
    _, tx = optimizer_factory({"optimizer": "SGD", "lr": 1e-3, "momentum": 0.9})
    batch = _batch(B=8)
    inputs = jnp.asarray(batch["surface_samples_inputs"])
    example = (
        jnp.asarray(batch["space_samples_src"]),
        inputs[..., 0:3], inputs[..., 3:6], inputs[..., 6:7],
    )
    state = create_train_state(model, jax.random.PRNGKey(0), example, tx)
    mesh = make_mesh(data=8, query=1)
    steps = make_steps(model, "arbitrary", tx, mesh=mesh)
    state = replicate(state, mesh)
    losses = []
    for _ in range(3):
        gbatch = globalize_batch(batch, mesh)
        state, loss = steps["train_step"](state, gbatch, 1e-3)
        losses.append(float(loss))
    return losses, state


def test_two_process_step_matches_single_process(tmp_path):
    """2-process fused shard_map training == single-process: exactly the
    invariant a pod launch of the shipped configs relies on."""
    from tests.multihost_runner import _checksums

    _launch_pair("step", [tmp_path])
    results = []
    for pid in (0, 1):
        with open(tmp_path / f"step_{pid}.json") as f:
            results.append(json.load(f))

    assert results[0]["is_main"] and not results[1]["is_main"]
    # Both processes observe the identical (replicated) loss trajectory.
    # Exact equality is deliberate: it asserts the bitwise-replication
    # invariant — every rank's psum/pmean returns the same bits, so
    # replicated state can never drift apart.  Current gloo (and TPU ICI)
    # allreduce algorithms satisfy it; if a future collectives backend
    # returns rank-varying rounding, this should FAIL loudly (replicated
    # optimizer states silently diverging is a real production failure),
    # not be papered over with a tolerance.
    assert results[0]["losses"] == results[1]["losses"]
    assert results[0]["params"] == results[1]["params"]

    ref_losses, ref_state = _single_process_reference()
    # 2-proc vs 1-proc is NOT bitwise: gloo's hierarchical allreduce
    # (4 local + cross-process) and XLA's 8-device psum sum in different
    # orders, so step-1 losses differ at ~1e-7 and the difference
    # amplifies through SGD-momentum + BN running stats by step 3 —
    # measured up to 3.8e-4 relative on the SIGNED leaf sums (which are
    # cancellation-prone: a near-zero-init bias leaf sums to ~0.01 with
    # abs-sum ~0.02, so an 8e-6 absolute wobble reads as ~4e-4 relative).
    # rtol=1e-3 leaves ~2.5x flake margin; real slicing/collective bugs
    # show up at O(1).
    np.testing.assert_allclose(
        results[0]["losses"], ref_losses, rtol=2e-4
    )
    for got, want in zip(results[0]["params"], _checksums(ref_state.params)):
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=3e-5)
    for got, want in zip(
        results[0]["batch_stats"], _checksums(ref_state.batch_stats)
    ):
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=3e-5)


def test_two_process_train_cli(tmp_path):
    """The real ``train.py`` runs 2-process end-to-end on the synthetic
    fixture: sliced loaders, globalized train batches, padded+sliced
    validation batches, process-0-only writes."""
    from nsdp_tpu.data.synthetic import generate_synthetic_dataset, synthetic_config

    fixture = generate_synthetic_dataset(
        str(tmp_path / "synth"), n_identities=2, n_motions_per_identity=2,
        n_frames=4, n_surface=200, n_space=200,
    )
    cfg = synthetic_config(fixture, n_surface=64, n_space=64)
    cfg["experiment"]["out_dir"] = str(tmp_path / "out")
    cfg["training"]["batch_size"] = 8  # multi-host requires batch % devices == 0
    cfg["training"]["epochs"] = 2
    cfg["validation"]["frequency"] = 1  # epoch 1 runs the padded+sliced val path
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    outs = _launch_pair("cli", [cfg_path])
    for out in outs:
        assert "(2 process(es))" in out, out[-2000:]

    exp_dir = os.path.join(cfg["experiment"]["out_dir"], "synthetic")
    files = os.listdir(exp_dir)
    assert "params.json" in files
    assert "stats.txt" in files
    assert any(f.startswith("model_") for f in files)
    assert any(f.startswith("modelbest_") for f in files)
    # stats were written by exactly one process: every (epoch, batch) line
    # ("epoch: E - batch: B - loss: ...") appears once
    with open(os.path.join(exp_dir, "stats.txt")) as f:
        stats = [l.split() for l in f.read().splitlines() if l.strip()]
    assert stats, "stats.txt is empty"
    keys = [(l[1], l[4]) for l in stats]
    assert len(keys) == len(set(keys)), stats
