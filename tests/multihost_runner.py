"""Subprocess entry point for the REAL 2-process multi-host tests.

Launched as ``python -m tests.multihost_runner <phase> <process_id> <port> ...``
from the repo root, once per process, each with 4 virtual CPU devices
(``XLA_FLAGS=--xla_force_host_platform_device_count=4``) and gloo
cross-process collectives — the CPU stand-in for a 2-host TPU slice over
DCN (SURVEY.md §2.9).  ``tests/test_multihost_2proc.py`` spawns two of
these and checks their outputs against a single-process 8-device run.

Phases:
  step <pid> <port> <out_dir>
      initialize jax.distributed (2 processes), build the TINY fused
      model, run 3 shard_map train steps on a deterministic global batch
      fed through the real multi-host input path
      (``process_batch_slice`` + ``globalize_batch``), and dump the loss
      trajectory + parameter/batch-stats checksums to
      ``<out_dir>/step_<pid>.json``.
  cli <pid> <port> <config_yaml>
      initialize jax.distributed (2 processes), then run the REAL
      ``train.main`` on <config_yaml> — the full CLI multi-host path
      (per-process loader slices, globalized batches, process-0-guarded
      checkpoint/stats writes).  train.py's own ``initialize_distributed``
      call then sees the live runtime ("already initialized" is tolerated
      by design).
"""

import json
import sys


def _init(pid: int, port: str) -> None:
    import jax

    # Mirror tests/conftest.py: CPU platform (the axon TPU plugin ignores
    # the env var), f32 matmul parity.  Must precede first device use.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from nsdp_tpu.parallel import initialize_distributed

    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4, jax.local_devices()


def _checksums(tree):
    """Order-independent float summaries of every leaf of a replicated tree."""
    import jax
    import numpy as np

    out = []
    for leaf in jax.tree.leaves(tree):
        a = np.asarray(leaf, dtype=np.float64)
        out.append([float(np.sum(a)), float(np.sum(np.abs(a)))])
    return out


def run_step_phase(pid: int, port: str, out_dir: str) -> None:
    _init(pid, port)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nsdp_tpu.models import build_model
    from nsdp_tpu.parallel import (
        globalize_batch,
        is_main_process,
        make_train_mesh,
        process_batch_slice,
        replicate,
    )
    from nsdp_tpu.training import (
        create_train_state,
        make_steps,
        optimizer_factory,
    )

    from tests.test_parallel import TINY, _batch

    cfg = {"model": dict(TINY["model"], fused_attention=True)}
    model = build_model(cfg)
    _, tx = optimizer_factory({"optimizer": "SGD", "lr": 1e-3, "momentum": 0.9})

    B = 8
    batch = _batch(B=B)  # the deterministic GLOBAL batch (seed 0)
    inputs = jnp.asarray(batch["surface_samples_inputs"])
    example = (
        jnp.asarray(batch["space_samples_src"]),
        inputs[..., 0:3], inputs[..., 3:6], inputs[..., 6:7],
    )
    state = create_train_state(model, jax.random.PRNGKey(0), example, tx)

    mesh = make_train_mesh(B)
    assert dict(mesh.shape) == {"data": 8, "query": 1}, mesh.shape
    steps = make_steps(model, "arbitrary", tx, mesh=mesh)
    state = replicate(state, mesh)

    sl = process_batch_slice(B)  # this process's rows of the global batch
    losses = []
    for _ in range(3):
        local = {k: v[sl] for k, v in batch.items()}
        gbatch = globalize_batch(local, mesh)
        state, loss = steps["train_step"](state, gbatch, 1e-3)
        losses.append(float(loss))

    result = {
        "process_id": pid,
        "is_main": bool(is_main_process()),
        "losses": losses,
        "params": _checksums(state.params),
        "batch_stats": _checksums(state.batch_stats),
    }
    import os

    with open(os.path.join(out_dir, f"step_{pid}.json"), "w") as f:
        json.dump(result, f)
    print(f"step phase OK (pid {pid}): losses={losses}")


def run_cli_phase(pid: int, port: str, config_yaml: str) -> None:
    _init(pid, port)

    import train as train_cli

    train_cli.main([config_yaml, "--seed", "0", "--matmul_precision", "highest"])
    print(f"cli phase OK (pid {pid})")


def main(argv):
    phase, pid, port = argv[0], int(argv[1]), argv[2]
    if phase == "step":
        run_step_phase(pid, port, argv[3])
    elif phase == "cli":
        run_cli_phase(pid, port, argv[3])
    else:
        raise SystemExit(f"unknown phase {phase!r}")


if __name__ == "__main__":
    main(sys.argv[1:])
