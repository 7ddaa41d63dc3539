"""Device mesh construction and sharding helpers.

Training uses jit-with-sharded-arguments SPMD: the train state is replicated,
batches are sharded along the batch axis on ``'data'``, and XLA inserts the
gradient / BatchNorm all-reduces over ICI.  Field evaluation shards the
query-point axis on ``'query'`` (anchors/latents replicated, queries split) —
no collectives until the gather of results.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_map(f, mesh: Mesh, in_specs, out_specs):
    """``jax.shard_map`` with varying-manual-axes checking off.

    The step/serving bodies mix per-shard Pallas kernels with explicit
    ``psum``s whose replication the checker cannot see through; outputs
    declared replicated (``P()``) are guaranteed so by construction
    (identical psum results on every shard)."""
    return jax.shard_map(
        f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )


def _multiprocess_configured() -> bool:
    """True when the environment configures a launch of MORE THAN ONE
    process (explicit coordinator, Cloud TPU pod metadata, SLURM, OpenMPI).

    Presence alone is not enough: single-host TPU plugins set e.g.
    ``TPU_WORKER_HOSTNAMES=localhost``, and SLURM/MPI export their vars
    for one-node jobs too — each var is checked for a value that actually
    implies >1 process.
    """
    import os

    env = os.environ.get
    if env("JAX_COORDINATOR_ADDRESS") or env("COORDINATOR_ADDRESS"):
        return True  # an explicit coordinator is always multi-process intent
    bounds = env("TPU_PROCESS_BOUNDS")  # e.g. "2,2,1" — product = #processes
    if bounds:
        try:
            n = 1
            for d in bounds.split(","):
                n *= int(d)
            if n > 1:
                return True
        except ValueError:
            return True  # unparseable pod metadata: let init report it
    if "," in (env("TPU_WORKER_HOSTNAMES") or ""):
        return True
    for var in ("SLURM_JOB_NUM_NODES", "OMPI_COMM_WORLD_SIZE"):
        try:
            if int(env(var) or 1) > 1:
                return True
        except ValueError:
            pass
    return False


def initialize_distributed(**kwargs) -> None:
    """Multi-host init; no-op when no multi-process launch is configured.

    Calls ``jax.distributed.initialize`` when the environment (or explicit
    kwargs) configures a multi-process launch.  "Already initialised" is
    tolerated; any other failure PROPAGATES — silently degrading a pod
    launch into N independent single-process runs would have every host
    believe it is process 0 and corrupt the shared experiment directory
    (concurrent stats.txt / checkpoint writes).
    """
    if not (kwargs or _multiprocess_configured()):
        return
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" in str(e).lower():
            return
        raise


def make_mesh(
    devices: Optional[Sequence] = None,
    data: int = -1,
    query: int = 1,
) -> Mesh:
    """Build a ``('data', 'query')`` mesh.

    Args:
      devices: devices to use (default: all).
      data: size of the data axis; -1 = all remaining devices.
      query: size of the query axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % query != 0:
            raise ValueError(f"{n} devices not divisible by query={query}")
        data = n // query
    if data * query != n:
        raise ValueError(f"data*query = {data*query} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, query)
    return Mesh(dev_array, axis_names=("data", "query"))


def make_train_mesh(batch_size: int) -> Mesh:
    """Data-parallel mesh using the most devices that divide the batch.

    Prints a prominent warning when the batch size forces fewer chips than
    available (e.g. a prime batch size trains on ONE chip) — silent
    degradation would waste most of the pod.

    Multi-host launches REQUIRE the batch to divide over all devices: a
    partial-device mesh would take an uneven device subset across hosts,
    and per-process loader slices (``process_batch_slice``, batch/n_proc
    contiguous rows each) could no longer match the rows the local
    devices own — ``globalize_batch`` would fail on the first batch.
    Fail at mesh construction with an actionable message instead.
    """
    n = len(jax.devices())
    n_proc = jax.process_count()
    if n_proc > 1 and batch_size % n:
        raise ValueError(
            f"multi-host training ({n_proc} processes, {n} devices) "
            f"requires batch_size divisible by the device count; got "
            f"batch_size={batch_size}. Pick a multiple of {n}."
        )
    data = 1
    for d in range(n, 0, -1):
        if batch_size % d == 0:
            data = d
            break
    if data < n:
        import warnings

        warnings.warn(
            f"batch_size={batch_size} is not divisible by the {n} available "
            f"devices; training uses only {data} chip(s) and idles "
            f"{n - data}. Pick a batch size divisible by {n} to use the "
            "whole mesh.",
            stacklevel=2,
        )
    return make_mesh(devices=jax.devices()[:data], data=data, query=1)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh):
    """Shard every leaf's leading (batch) axis across the 'data' axis."""
    def put(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def shard_queries(points, mesh: Mesh):
    """Shard a (B, Q, 3) query tensor's Q axis across the 'query' axis."""
    return jax.device_put(points, NamedSharding(mesh, P(None, "query")))
