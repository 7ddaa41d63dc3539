#!/usr/bin/env python
"""Train-step benchmark at reference scale on the real chip.

Measures the stage-1 train step (batch 16, 5000 surface + 5000 space
samples, full-size encoder/decoder) for a dtype x fused-attention matrix,
using the same slope protocol as bench.py: per-step time is the slope
between a 1-step and a (1+K)-step on-device ``lax.fori_loop`` chain
synchronised by a scalar fetch, cancelling the ~26 ms tunnel cost.

  python scripts/bench_train.py [--combos f32,f32+fused,bf16,bf16+fused]
                                [--batch 16] [--k 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))



def combo_measure(dtype_key, fused, batch_size, K, n_rep=5,
                  model_type="forward"):
    """Build the train-step chain once; returns a repeatable measure()
    closure (seconds/step) so bench.py's repeats reuse the compile."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import FLAGSHIP_CONFIG, _example_batch
    from nsdp_tpu.models import build_model
    from nsdp_tpu.training import create_train_state, make_steps, optimizer_factory

    cfg = {
        "model": dict(
            FLAGSHIP_CONFIG["model"],
            type=model_type,
            compute_dtype=dtype_key,
            fused_attention=fused,
        )
    }
    model = build_model(cfg)
    _, tx = optimizer_factory({"optimizer": "Adam", "lr": 5e-4})
    steps = make_steps(model, model_type, tx)

    batch_np = _example_batch(B=batch_size, N=5000, Q=5000)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    if model_type == "arbitrary":
        i = batch["surface_samples_inputs"]
        example = (
            batch["space_samples_src"], i[..., 0:3], i[..., 3:6], i[..., 6:7]
        )
    else:
        example = (batch["space_samples_src"], batch["surface_samples_inputs"])
    state = create_train_state(model, jax.random.PRNGKey(0), example, tx)

    # un-jitted inner step for the on-device chain (the jitted train_step
    # donates its input state, which a fori_loop carry cannot)
    def chain(state, k):
        def body(i, s):
            s2, _ = steps["train_step"].__wrapped__(s, batch, 5e-4)
            return s2
        out = jax.lax.fori_loop(0, k, body, state)
        return jnp.sum(jax.tree.leaves(out.params)[0])

    chain_j = jax.jit(chain, static_argnums=1)

    from bench import slope_time

    def measure():
        return slope_time(lambda k: float(chain_j(state, k)), K, n_rep=n_rep)

    return measure


def bench_combo(dtype_key, fused, batch_size, K, n_rep=5,
                model_type="forward"):
    return combo_measure(dtype_key, fused, batch_size, K, n_rep, model_type)()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--combos", default="f32,f32+fused,bf16,bf16+fused"
    )
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--k", type=int, default=8)
    parser.add_argument(
        "--model-type", default="forward",
        choices=["forward", "backward", "arbitrary"],
    )
    args = parser.parse_args(argv)

    results = {}
    for combo in args.combos.split(","):
        fused = combo.endswith("+fused")
        dtype_key = "bfloat16" if combo.startswith("bf16") else "float32"
        last_err = None
        for _ in range(3):  # tunnel is occasionally flaky
            try:
                dt = bench_combo(
                    dtype_key, fused, args.batch, args.k,
                    model_type=args.model_type,
                )
                break
            except Exception as e:
                last_err = e
                time.sleep(20)
        else:
            raise last_err
        results[combo] = dt
        print(json.dumps({
            "combo": combo, "step_ms": round(dt * 1e3, 1),
            "batch": args.batch, "model_type": args.model_type,
            "shapes": "N=5000 Q=5000 d=256",
        }), flush=True)
    return results


if __name__ == "__main__":
    main()
