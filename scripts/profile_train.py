#!/usr/bin/env python
"""Profile the stage-1 train step on the real chip and print a per-kernel
device-time breakdown.

Runs a few warm steps under ``jax.profiler.trace`` (works through the
tunnel), then parses the perfetto JSON for the TPU device track and prints
the top ops by total device time, grouped by a coarse name bucket.

  python scripts/profile_train.py [--combos bf16+fused] [--batch 16]
                                  [--steps 3] [--out /tmp/nsdp_profile]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _bucket(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "mosaic" in n:
        return "pallas kernels (attention/fps/knn)"
    if "fusion" in n:
        return "xla fusions"
    if "convolution" in n or "dot" in n:
        return "xla matmuls"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "layout/copies"
    if "all-reduce" in n or "all-gather" in n or "reduce-scatter" in n:
        return "collectives"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--combo", default="bf16+fused")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--model-type", default="forward")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/nsdp_profile")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import FLAGSHIP_CONFIG, _example_batch
    from nsdp_tpu.models import build_model
    from nsdp_tpu.training import create_train_state, make_steps, optimizer_factory

    dtype_key = "bfloat16" if args.combo.startswith("bf16") else "float32"
    fused = "fused" in args.combo
    cfg = {
        "model": dict(
            FLAGSHIP_CONFIG["model"],
            type=args.model_type,
            compute_dtype=dtype_key,
            fused_attention=fused,
        )
    }
    model = build_model(cfg)
    _, tx = optimizer_factory({"optimizer": "Adam", "lr": 5e-4})
    steps = make_steps(model, args.model_type, tx)

    batch_np = _example_batch(B=args.batch, N=5000, Q=5000)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    if args.model_type == "arbitrary":
        i = batch["surface_samples_inputs"]
        example = (
            batch["space_samples_src"], i[..., 0:3], i[..., 3:6], i[..., 6:7]
        )
    else:
        example = (batch["space_samples_src"], batch["surface_samples_inputs"])

    state = create_train_state(model, jax.random.PRNGKey(0), example, tx)

    def run(state, n):
        for _ in range(n):
            state, loss = steps["train_step"](state, batch, 5e-4)
        return state, loss

    # warm up / compile outside the trace
    state, loss = run(state, 2)
    float(loss)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        state, loss = run(state, args.steps)
        float(loss)

    traces = sorted(
        glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not traces:
        print("no trace file produced", file=sys.stderr)
        sys.exit(1)
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)

    events = trace.get("traceEvents", [])
    # find the TPU device pid
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    per_op = collections.Counter()
    per_bucket = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        per_op[name] += dur
        per_bucket[_bucket(name)] += dur
        total += dur

    per_step = total / args.steps
    print(f"\ntotal device time: {total:.1f} ms over {args.steps} steps "
          f"= {per_step:.1f} ms/step\n")
    print("== by bucket (ms/step) ==")
    for b, t in per_bucket.most_common():
        print(f"  {t/args.steps:8.2f}  {100*t/total:5.1f}%  {b}")
    print(f"\n== top {args.top} ops (ms/step) ==")
    for name, t in per_op.most_common(args.top):
        print(f"  {t/args.steps:8.3f}  {100*t/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
