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


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (``jax.distributed.initialize``); no-op single-host."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialised or single-process


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
    """
    n = len(jax.devices())
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
