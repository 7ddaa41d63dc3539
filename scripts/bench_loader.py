#!/usr/bin/env python
"""Host input-pipeline throughput at stage-1 scale.

Builds a synthetic fixture with reference-scale per-frame files (100k
surface points + normals, 200k space samples — the sizes the real
DeformingThings4D preprocessing emits) and measures DataLoader item
throughput for sync / thread / process workers.  Host-only, no accelerator.

  python scripts/bench_loader.py [--root /tmp/bench_loader]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="/tmp/bench_loader")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=3)
    args = parser.parse_args(argv)

    from nsdp_tpu.data import DataLoader
    from nsdp_tpu.data.datasets import Deform4DFlowDataset
    from nsdp_tpu.data.synthetic import generate_synthetic_dataset, synthetic_config

    fixture_dir = os.path.join(args.root, "data")
    if not os.path.isdir(fixture_dir):
        print("generating stage-1-scale fixture (one-time)...", flush=True)
        generate_synthetic_dataset(
            fixture_dir, n_identities=2, n_motions_per_identity=2,
            n_frames=5, n_surface=100_000, n_space=200_000,
        )
    fixture = {
        "dataset_dir": os.path.join(fixture_dir, "frames"),
        "split_dir": os.path.join(fixture_dir, "splits"),
    }
    # partial_shape_ratio stays 1.0: the KD-tree hole path yields
    # variable-size items that only collate at batch 1 (reference
    # semantics; every shipped config sets 1.0)
    cfg = synthetic_config(fixture, n_surface=5000, n_space=5000)
    cfg["data"]["noise_level"] = 0.01  # stage-1 source noise on

    ds = Deform4DFlowDataset(
        cfg, "identity_seen", "train_seen", num_sampled_pairs=-1,
        rng=np.random.RandomState(0),
    )
    print(f"{len(ds)} pairs; measuring {args.epochs} epochs per config",
          flush=True)

    results = {}
    for label, kw in (
        ("sync", dict(num_workers=0)),
        ("4 threads", dict(num_workers=4)),
        ("4 processes", dict(num_workers=4, worker_type="process")),
    ):
        loader = DataLoader(
            ds, batch_size=args.batch, shuffle=True, seed=0,
            drop_last=False, **kw,
        )
        n_items = 0
        # warm one epoch (page cache, process spawn)
        for batch in loader:
            pass
        t0 = time.perf_counter()
        for _ in range(args.epochs):
            for batch in loader:
                n_items += batch["surface_samples_inputs"].shape[0]
        dt = time.perf_counter() - t0
        results[label] = n_items / dt
        print(json.dumps({
            "config": label, "items_per_sec": round(n_items / dt, 1),
            "batch": args.batch,
            "item": "100k-surface/200k-space npz -> 5000/5000 samples "
                    "+ masks + partial holes",
        }), flush=True)
    return results


if __name__ == "__main__":
    main()
