#!/usr/bin/env python
"""Matched-interval A/B of inference qps + drag latency across worktrees.

VERDICT r3 item 2: BENCH_r03 read 7.17M qps / 3.63 ms drag vs round 2's
8.36M / 3.05 ms, and nobody knew whether the Dekker split, the bench
rework, or tunnel/thermal state moved it.  This driver measures the SAME
self-contained harness (inline model config + slope protocol — no import
of the worktree's bench.py, whose API changed across rounds) in each
given worktree, interleaved A/B/C/A/B/C/... so chip-interval drift hits
every variant equally.  Each measurement runs in a fresh subprocess from
the worktree's own directory (its own nsdp_tpu).

  python scripts/ab_qps_drag.py /root/repo /tmp/wt_predekker /tmp/wt_r2 \
      --reps 3 --out /tmp/ab.jsonl
"""

import argparse
import json
import os
import subprocess
import sys
import time

SNIPPET = r"""
import json, time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

CONFIG = {
    "model": {
        "type": "arbitrary",
        "use_normals": False,
        "encoder": "pointransformer",
        "encoder_kwargs": dict(
            npoints_per_layer=[5000, 500, 100], nneighbor=16,
            nneighbor_reduced=10, nfinal_transformers=3,
            d_transformer=256, d_reduced=120, full_SA=True,
        ),
        "decoder": "crossatten",
        "decoder_kwargs": dict(
            dim_inp=256, dim=200, nneigh=7, hidden_dim=128, out_dim=3
        ),
    },
}
Q, N, K = 65536, 5000, 20


def slope_time(run, K, n_rep=7):
    def sync(k):
        run(k)
        ts = []
        for _ in range(n_rep):
            t0 = time.perf_counter()
            run(k)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))
    t1 = sync(1)
    t2 = sync(1 + K)
    return max((t2 - t1) / K, 1e-9)


from nsdp_tpu.models import build_model
from nsdp_tpu.models.fast_predict import (
    make_fast_predict, make_fast_arbitrary_halves,
)

rng = np.random.RandomState(0)
surf_src = rng.randn(1, N, 3).astype(np.float32)
surf_tgt = rng.randn(1, N, 3).astype(np.float32)
maskc = (rng.rand(1, N, 1) > 0.5).astype(np.float32)
inputs = jnp.asarray(
    np.concatenate([surf_src, surf_tgt * maskc, maskc], -1))
space = jnp.asarray(rng.randn(1, Q, 3).astype(np.float32))
surf_src, surf_tgt, mask = (
    inputs[..., 0:3], inputs[..., 3:6], inputs[..., 6:7])

model = build_model(CONFIG)
variables = jax.jit(partial(model.init, train=False))(
    jax.random.PRNGKey(0), space[:, :128], surf_src, surf_tgt, mask)

predict = make_fast_predict(model, variables, "arbitrary", nneigh=7)

@jax.jit
def chain(space_src, k):
    def body(i, x):
        return predict(x, inputs)
    return jnp.sum(jax.lax.fori_loop(0, k, body, space_src))

qps = Q / slope_time(lambda k: float(chain(space, k)), K)

halves = make_fast_arbitrary_halves(model, nneigh=7)
cano = jax.jit(partial(halves["canonicalize"], variables))
deform = jax.jit(partial(halves["deform"], variables))
space_cano, surf_cano = cano(space, surf_src)

@jax.jit
def dchain(x, k):
    def body(i, x):
        return deform(x, surf_cano, surf_tgt, mask)
    return jnp.sum(jax.lax.fori_loop(0, k, body, x))

drag_ms = slope_time(lambda k: float(dchain(space_cano, k)), K) * 1e3
print(json.dumps({"qps": round(qps, 1), "drag_ms": round(drag_ms, 3)}))
"""


def run_one(worktree, timeout=1800):
    # env passes through UNCHANGED: the axon TPU plugin registers via the
    # ambient PYTHONPATH (/root/.axon_site) — stripping it breaks backend
    # init.  `python -c` prepends cwd, so the worktree's nsdp_tpu wins.
    proc = subprocess.run(
        [sys.executable, "-c", SNIPPET],
        cwd=worktree, capture_output=True, text=True, timeout=timeout,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(
        f"{worktree}: no result (rc={proc.returncode}):\n"
        f"{(proc.stderr or proc.stdout)[-2000:]}"
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("worktrees", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    rows = []
    for rep in range(args.reps):
        for wt in args.worktrees:
            t0 = time.time()
            try:
                r = run_one(wt)
            except Exception as e:
                r = {"error": str(e)[-500:]}
            row = {"rep": rep, "worktree": wt,
                   "wall_s": round(time.time() - t0, 1), **r}
            rows.append(row)
            print(json.dumps(row), flush=True)
            if args.out:
                with open(args.out, "a") as f:
                    f.write(json.dumps(row) + "\n")

    # summary: median per worktree
    import statistics
    for wt in args.worktrees:
        qs = [r["qps"] for r in rows if r["worktree"] == wt and "qps" in r]
        ds = [r["drag_ms"] for r in rows
              if r["worktree"] == wt and "drag_ms" in r]
        if qs:
            print(json.dumps({
                "worktree": wt,
                "qps_median": round(statistics.median(qs), 1),
                "qps_all": qs,
                "drag_ms_median": round(statistics.median(ds), 3),
                "drag_ms_all": ds,
            }), flush=True)


if __name__ == "__main__":
    main()
