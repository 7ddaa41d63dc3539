"""SPMD parallelism over a device mesh.

The reference is strictly single-device (``train.py:74-77``; SURVEY.md §2.9).
This layer introduces the TPU-native scaling story:

* mesh axes ``('data', 'query')``: data parallelism over the batch for
  training (gradient/BN all-reduce over ICI, inserted by XLA from sharding
  annotations), and query-point sharding for field evaluation — the decoder's
  query axis is embarrassingly parallel, so inference throughput scales
  linearly in chips;
* multi-host initialisation via ``jax.distributed`` with per-host data
  feeding over DCN.
"""

from nsdp_tpu.parallel.mesh import (
    make_mesh,
    make_train_mesh,
    replicate,
    shard_batch,
    shard_queries,
    initialize_distributed,
)
from nsdp_tpu.parallel.multihost import (
    globalize_batch,
    is_main_process,
    local_slice,
    process_batch_slice,
)

__all__ = [
    "make_mesh",
    "make_train_mesh",
    "replicate",
    "shard_batch",
    "shard_queries",
    "initialize_distributed",
    "globalize_batch",
    "is_main_process",
    "local_slice",
    "process_batch_slice",
]
