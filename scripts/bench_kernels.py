"""Kernel micro-benchmarks on the real chip (tile sweeps, dtype knobs).

Times the fused attention kernel at the model's hot shapes with the same
dependent-chain slope protocol as ``bench.py`` (the tunnel's fixed sync cost
cancels between a 1-iteration and a (1+K)-iteration chain).

Usage:
    python scripts/bench_kernels.py [--which decoder|encoder|tsa]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _slope(fn, K=32):
    from bench import slope_time

    return slope_time(lambda k: float(fn(k)), K)


def bench_attention(shape_name, B, Q, M, D, k, pos_only=False,
                    has_global=False, tiles=(128, 256, 512, 1024),
                    dtypes=("float32", "bfloat16"), grad=False,
                    exact_self=True):
    import jax
    import jax.numpy as jnp

    from nsdp_tpu.ops.attention_pallas import (
        fused_vector_attention,
        knn_vector_attention,
    )

    rng = np.random.RandomState(0)
    xyz_q = jnp.asarray(rng.randn(B, Q, 3).astype(np.float32))
    kv = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
    if pos_only:
        qf = K_a = V_a = None
    else:
        qf = jnp.asarray(rng.randn(B, Q, D).astype(np.float32))
        K_a = jnp.asarray(rng.randn(B, M, D).astype(np.float32))
        V_a = jnp.asarray(rng.randn(B, M, D).astype(np.float32))
    k_g = v_g = None
    if has_global:
        k_g = jnp.asarray(rng.randn(B, D).astype(np.float32))
        v_g = jnp.asarray(rng.randn(B, D).astype(np.float32))
    w = [
        jnp.asarray(rng.randn(3, D).astype(np.float32) * 0.1),
        jnp.zeros((D,), jnp.float32),
        jnp.asarray(rng.randn(D, D).astype(np.float32) * 0.1),
        jnp.zeros((D,), jnp.float32),
        jnp.asarray(rng.randn(D, D).astype(np.float32) * 0.1),
        jnp.zeros((D,), jnp.float32),
        jnp.asarray(rng.randn(D, D).astype(np.float32) * 0.1),
        jnp.zeros((D,), jnp.float32),
    ]

    for dtype in dtypes:
        for tile in tiles:
            if tile > ((Q + 127) // 128) * 128:
                continue

            if grad:
                # forward + hand-written Pallas backward (training path)
                def loss(x, _tile=tile):
                    out = knn_vector_attention(
                        x, kv, qf, K_a, V_a, k_g, v_g, None, *w,
                        k, _tile, None,
                    )
                    return jnp.sum(out * out)

                gfn = jax.grad(loss)

                @jax.jit
                def chain(xq, n_iter, _gfn=gfn):
                    def body(i, x):
                        return x + _gfn(x) * 1e-30

                    return jnp.sum(
                        jax.lax.fori_loop(0, n_iter, body, xq)[0, 0]
                    )
            else:

                @jax.jit
                def chain(xq, n_iter, _tile=tile, _dtype=dtype):
                    def body(i, x):
                        out = fused_vector_attention(
                            x, kv, qf, K_a, V_a, *w,
                            k=k, tile=_tile, k_glob=k_g, v_glob=v_g,
                            compute_dtype=_dtype, exact_self=exact_self,
                        )
                        # data dependency that XLA cannot fold away
                        return x + out[:, :, :3] * 1e-30

                    return jnp.sum(
                        jax.lax.fori_loop(0, n_iter, body, xq)[0, 0]
                    )

            per = _slope(lambda n_iter: chain(xyz_q, n_iter))
            print(
                f"{shape_name:10s} tile={tile:5d} dtype={dtype:9s} "
                f"{'fwd+bwd' if grad else 'fwd':7s} "
                f"{per * 1e3:8.3f} ms  ({B * Q / per / 1e6:7.2f} Mq/s)"
            )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--which", default="all",
                   choices=["all", "decoder", "encoder", "tsa"])
    p.add_argument("--grad", action="store_true",
                   help="time forward + Pallas backward (training path)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--cross-fast", action="store_true",
                   help="decoder shape with exact_self=False (the "
                        "inference fast path, fast_decoder.decode_fast)")
    args = p.parse_args(argv)

    dtypes = ("float32",) if args.grad else ("float32", "bfloat16")
    if args.which in ("all", "decoder"):
        # CrossTransformerDecoder: Q=65536 queries over 100 anchors, D=200,
        # 7 neighbours + the global token
        bench_attention("decoder", args.batch, 65536 // max(args.batch, 1),
                        100, 200, 7, has_global=True, grad=args.grad,
                        dtypes=dtypes, exact_self=not args.cross_fast)
    if args.which in ("all", "encoder"):
        # transformer_begin (pos_only local self-attention, d_reduced=120)
        bench_attention("enc_begin", args.batch, 5000, 5000, 120, 10,
                        pos_only=True, grad=args.grad, dtypes=dtypes)
    if args.which in ("all", "tsa"):
        # TransformerSetAbstraction round (500 centres over 5000 points)
        bench_attention("tsa0", args.batch, 500, 5000, 120, 16,
                        grad=args.grad, dtypes=dtypes)


if __name__ == "__main__":
    main()
