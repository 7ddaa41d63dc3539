#!/usr/bin/env python
"""Short on-chip convergence check for precision/dtype knobs.

Runs T real stage-1 train steps (shipped config: f32 + fused kernels) from
a fixed init on a fixed synthetic batch and prints the loss trajectory, so
``--matmul_precision default`` (the CLI default since round 3) can be
compared against ``highest`` on real hardware, and the opt-in
``compute_dtype: bfloat16`` activations path against the shipped f32
(VERDICT r4 item 4: the bf16 train numbers bench.py reports as secondary
``*_bf16`` metrics need convergence evidence of their own).  The fused
kernels pin their own precision; ``--precision`` exercises the XLA (flax)
side the flag actually governs, ``--compute-dtype`` the activation dtype
of the whole step.

  python scripts/check_precision_convergence.py --precision default
  python scripts/check_precision_convergence.py --precision highest
  python scripts/check_precision_convergence.py --compute-dtype bfloat16
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--precision", default="default",
                        choices=["default", "high", "highest"])
    parser.add_argument("--compute-dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--steps", type=int, default=40)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--every", type=int, default=5)
    args = parser.parse_args(argv)

    import jax
    jax.config.update("jax_default_matmul_precision", args.precision)
    import jax.numpy as jnp

    from __graft_entry__ import FLAGSHIP_CONFIG, _example_batch
    from nsdp_tpu.models import build_model
    from nsdp_tpu.training import (
        create_train_state, make_steps, optimizer_factory,
    )

    cfg = {"model": dict(FLAGSHIP_CONFIG["model"], type="forward",
                         fused_attention=True,
                         compute_dtype=args.compute_dtype)}
    model = build_model(cfg)
    _, tx = optimizer_factory({"optimizer": "Adam", "lr": 5e-4})
    steps = make_steps(model, "forward", tx)

    batch_np = _example_batch(B=args.batch, N=5000, Q=5000)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    example = (batch["space_samples_src"], batch["surface_samples_inputs"])
    state = create_train_state(model, jax.random.PRNGKey(0), example, tx)

    losses = []
    for i in range(args.steps):
        state, loss = steps["train_step"](state, batch, 5e-4)
        if i % args.every == 0 or i == args.steps - 1:
            losses.append((i, round(float(loss), 6)))
    print(json.dumps({"precision": args.precision,
                      "compute_dtype": args.compute_dtype,
                      "batch": args.batch, "losses": losses}), flush=True)


if __name__ == "__main__":
    main()
