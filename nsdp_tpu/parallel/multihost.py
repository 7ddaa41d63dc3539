"""Multi-host input feeding.

On a multi-host TPU slice every process sees only its local devices; batches
must be assembled per-host and stitched into one global array.  The host
pipeline (``nsdp_tpu.data``) feeds each process its shard of the global
batch; :func:`globalize_batch` wraps
``jax.make_array_from_process_local_data`` so the train step sees one global
sharded batch (collectives ride ICI within the slice, DCN only carries the
input data).
"""

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_batch_slice(global_batch_size: int) -> slice:
    """The [start, stop) range of the global batch owned by this process."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {n} processes"
        )
    per = global_batch_size // n
    start = jax.process_index() * per
    return slice(start, start + per)


def local_slice(batch: Dict[str, Any], global_batch_size: int) -> Dict[str, Any]:
    """Slice a fully-assembled host batch down to this process's rows.

    Used for batches built whole on every process (e.g. padded validation
    batches) before :func:`globalize_batch`; for training, prefer assembling
    only the local rows in the first place (``DataLoader(batch_slice=...)``).
    Single-process this is the identity.
    """
    sl = process_batch_slice(global_batch_size)
    return jax.tree.map(
        lambda x: x[sl] if getattr(x, "ndim", 0) >= 1 else x, batch
    )


def is_main_process() -> bool:
    """True on the process that owns checkpoint/stats writes."""
    return jax.process_index() == 0


def globalize_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Assemble per-process local batch shards into global sharded arrays.

    Args:
      batch: dict of host numpy arrays holding this process's slice of the
        global batch (leading axis = local batch).
      mesh: the training mesh; arrays are sharded P('data') on axis 0.
    """
    def put(x):
        if getattr(x, "ndim", 0) == 0:
            return x
        sharding = NamedSharding(mesh, P("data"))
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, batch)
