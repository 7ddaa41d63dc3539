#!/usr/bin/env python
"""The missing gather experiment (VERDICT r3 item 5): scalar-prefetch
dynamic gather vs the one-hot MXU gather, at the stage-1 probe shape.

The fused attention kernels gather k=16 arbitrary rows per query from a
(M, W) table as one-hot matmuls — a (T, M) x (M, W) MXU pass per slot —
because Mosaic lowers no dynamic gather (``take_along_axis`` crashes the
compiler; docs/PERFORMANCE.md "the one-hot gather floor").  Round 2 asked
whether a ``PrefetchScalarGridSpec`` formulation — scalar-prefetched
indices driving the *block index map*, so the pipeline DMAs exactly the
addressed row per grid step — can beat it.  Round 3 argued it cannot
(block index maps work at block granularity, one row per grid step ⇒
T·k·tiles grid steps of (1, W) copies) but never measured it.  This
script measures it.

Probe shape (the first featured self-attention level of the stage-1 step
at reference scale): T=128 query rows per tile, M=5120 table rows, W=256
lanes, k=16 slots, 40 tiles — one full site call gathers
40·128·16 = 81,920 rows.

Both formulations produce the identical (tiles·T·k, W) gathered tensor;
outputs are verified equal before timing.  Timing uses the repo's slope
protocol (dependent on-device chains; see bench.py) with a true data
dependence threaded through the table so no iteration can be DCE'd.

  python scripts/bench_gather_prefetch.py [--tiles 40] [--interpret]
"""

import argparse
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T, M, W, K = 128, 5120, 256, 16


def onehot_gather(table, idx, *, tiles, interpret=False):
    """The in-kernel formulation: one (T, M) x (M, W) MXU pass per slot.

    grid (tiles, k); the whole table rides in VMEM (5120·256·4 ≈ 5.2 MB),
    exactly like the packed tables of the fused attention kernels
    (ops/attention_pallas.py).  Precision DEFAULT, as the kernels pin.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(idx_ref, table_ref, out_ref):
        s = pl.program_id(1)
        ids = jax.lax.broadcasted_iota(jnp.int32, (T, M), 1)
        # full (T, K) index block; pick this grid step's slot column by
        # lane select (a (T, 1) BlockSpec is not lowerable, and Mosaic
        # has no dynamic lane slice)
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (T, K), 1)
        col = jnp.max(
            jnp.where(lane_k == s, idx_ref[:], 0), axis=1, keepdims=True
        )
        onehot = (ids == col).astype(jnp.float32)
        out_ref[:] = jax.lax.dot_general(
            onehot, table_ref[:],
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
        )

    return pl.pallas_call(
        kernel,
        grid=(tiles, K),
        in_specs=[
            pl.BlockSpec((T, K), lambda i, s: (i, 0)),
            pl.BlockSpec((M, W), lambda i, s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((T, W), lambda i, s: (i * K + s, 0)),
        out_shape=jax.ShapeDtypeStruct((tiles * K * T, W), jnp.float32),
        interpret=interpret,
    )(idx, table)


def prefetch_gather(table, idx_flat, *, tiles, interpret=False):
    """PrefetchScalarGridSpec: indices drive the block index map — the
    pipeline DMAs row ``idx[i]`` of the table per grid step.  One grid
    step per gathered row: tiles·T·k steps of a (1, W) block each."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = tiles * K * T

    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = table_ref[:]

    # A flat (1, W) row block is not lowerable (sublane granularity is 8),
    # so the gathered row axis becomes the leading dim of a 3D view and the
    # block's trailing dims equal the array's — the DMA still moves one
    # (1, W) row per grid step, which IS this formulation's cost model.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, 1, W), lambda i, idx_ref: (idx_ref[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, W), lambda i, idx_ref: (i, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, 1, W), jnp.float32),
        interpret=interpret,
    )(idx_flat, table.reshape(M, 1, W))
    return out.reshape(R, W)


def _flat_rowmajor(idx):
    """(tiles, T, K) slot-major row order of the one-hot output layout:
    out row (i·K + s)·T + t  ==  gather of idx[i, t, s]."""
    return np.transpose(idx, (0, 2, 1)).reshape(-1)


def check_equal(tiles=2, interpret=True, seed=0):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    table = jnp.asarray(rng.randn(M, W).astype(np.float32))
    idx = rng.randint(0, M, size=(tiles, T, K)).astype(np.int32)
    a = np.asarray(
        onehot_gather(table, jnp.asarray(idx.reshape(tiles * T, K)),
                      tiles=tiles, interpret=interpret)
    )
    b = np.asarray(
        prefetch_gather(table, jnp.asarray(_flat_rowmajor(idx)),
                        tiles=tiles, interpret=interpret)
    )
    if interpret:
        np.testing.assert_array_equal(a, b)
    else:
        # on hardware the one-hot dot's DEFAULT-precision MXU pass
        # truncates the table operand to bf16-class; the DMA copy is
        # exact — same rows, bf16-rounded values
        np.testing.assert_allclose(a, b, rtol=2.0 ** -8, atol=2.0 ** -8)
    return True


def bench(tiles=40, K_chain=8, interpret=False):
    import jax
    import jax.numpy as jnp

    from bench import slope_time

    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(M, W).astype(np.float32))
    idx = rng.randint(0, M, size=(tiles, T, K)).astype(np.int32)
    idx_2d = jnp.asarray(idx.reshape(tiles * T, K))
    idx_flat = jnp.asarray(_flat_rowmajor(idx))

    results = {}
    for name, fn, iarg in (
        ("onehot_mxu", onehot_gather, idx_2d),
        ("prefetch_dma", prefetch_gather, idx_flat),
    ):
        gather = functools.partial(fn, tiles=tiles, interpret=interpret)

        @jax.jit
        def chain(c, n, _gather=gather, _iarg=iarg):
            # true dependence: the table is perturbed by the previous
            # iteration's output scalar, so no iteration can be DCE'd or
            # CSE'd (CLAUDE.md: structurally-zero chains get eliminated)
            def body(_, c):
                out = _gather(table + c * 1e-6, _iarg)
                return out[0, 0]
            return jax.lax.fori_loop(0, n, body, c)

        c0 = jnp.float32(0.0)
        dt = slope_time(lambda k: float(chain(c0, k)), K_chain)
        results[name] = dt
        print(json.dumps({
            "formulation": name, "ms_per_call": round(dt * 1e3, 3),
            "shape": f"T={T} M={M} W={W} k={K} tiles={tiles}",
        }), flush=True)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tiles", type=int, default=40)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args(argv)
    if args.check_only:
        check_equal(interpret=args.interpret)
        print("outputs equal")
        return
    check_equal(tiles=1, interpret=args.interpret)
    bench(tiles=args.tiles, interpret=args.interpret)


if __name__ == "__main__":
    main()
