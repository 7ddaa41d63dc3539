#!/usr/bin/env python
"""Offline converter: published torch checkpoints -> nsdp_tpu msgpack.

The framework also converts torch files on the fly when a ``weight_file``
points at one; this tool materialises the converted file once so repeated
runs skip torch entirely.

  python scripts/convert_checkpoint.py pretrained/arbitrary.pt \
      converted/arbitrary.msgpack --model-type arbitrary \
      [--config configs/deform4d/arbitrary.yaml]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("torch_file")
    parser.add_argument("out_file")
    parser.add_argument(
        "--model-type", default="arbitrary",
        choices=["forward", "backward", "arbitrary"],
    )
    parser.add_argument(
        "--config", default=None,
        help="config YAML defining the architecture (defaults to the "
        "flagship deform4d hyper-parameters)",
    )
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from nsdp_tpu.models import build_model
    from nsdp_tpu.utils.torch_convert import load_torch_checkpoint

    if args.config:
        from nsdp_tpu.utils.config import load_config

        config = load_config(args.config)
        config["model"]["type"] = args.model_type
    else:
        from __graft_entry__ import FLAGSHIP_CONFIG

        config = {"model": dict(FLAGSHIP_CONFIG["model"], type=args.model_type)}

    model = build_model(config)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(1, 64, 3), jnp.float32)
    surf = jnp.asarray(rng.randn(1, 128, 3), jnp.float32)
    mask = jnp.ones((1, 128, 1), jnp.float32)
    inputs = jnp.concatenate([surf, surf * mask, mask], -1)
    from functools import partial

    jinit = jax.jit(partial(model.init, train=False))
    if args.model_type == "arbitrary":
        variables = jinit(jax.random.PRNGKey(0), pts, surf, surf, mask)
    else:
        variables = jinit(jax.random.PRNGKey(0), pts, inputs)

    params, batch_stats = load_torch_checkpoint(
        args.torch_file, variables["params"], variables.get("batch_stats", {})
    )
    blob = serialization.to_bytes(
        {"params": params, "batch_stats": batch_stats}
    )
    os.makedirs(os.path.dirname(os.path.abspath(args.out_file)), exist_ok=True)
    with open(args.out_file, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out_file} ({len(blob)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
