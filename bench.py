"""Headline benchmark: deformation-field query throughput per chip.

Runs the flagship arbitrary-pose model (full-size FlowArbitrary: three
encoder+decoder passes per evaluation) at batch 1 with 5000 surface
conditioning points and a large query set, and reports end-to-end query
points/sec on one chip.  The north-star target is >=1M queries/sec/chip
(BASELINE.md); ``vs_baseline`` is the ratio against that target.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import FLAGSHIP_CONFIG, _example_batch
    from nsdp_tpu.models import build_model

    Q = 65536
    N = 5000
    model = build_model(FLAGSHIP_CONFIG)
    batch = _example_batch(B=1, N=N, Q=Q)
    inputs = jnp.asarray(batch["surface_samples_inputs"])
    space = jnp.asarray(batch["space_samples_src"])
    surf_src, surf_tgt, mask = (
        inputs[..., 0:3],
        inputs[..., 3:6],
        inputs[..., 6:7],
    )

    variables = model.init(
        jax.random.PRNGKey(0), space[:, :128], surf_src, surf_tgt, mask,
        train=False,
    )

    @jax.jit
    def deform(space_src):
        return model.apply(
            variables, space_src, surf_src, surf_tgt, mask, train=False
        )

    # warmup / compile
    out = deform(space)
    out.block_until_ready()

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = deform(space)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)

    dt = float(np.median(times))
    qps = Q / dt
    print(
        json.dumps(
            {
                "metric": "deformation_field_query_throughput",
                "value": round(qps, 1),
                "unit": "query_points/sec/chip",
                "vs_baseline": round(qps / 1e6, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
