#!/usr/bin/env python
"""End-to-end quickstart on synthetic data (no dataset download needed).

Generates a miniature DeformingThings4D-shaped dataset (deforming
icospheres, with the real directory contract), trains the stage-1 forward
deformation network briefly, evaluates it, and writes deformed meshes —
exercising the same code paths as the full pipelines.

  python examples/quickstart.py [--workdir /tmp/nsdp_quickstart] [--epochs 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import yaml


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/nsdp_quickstart")
    parser.add_argument("--epochs", type=int, default=8)
    args = parser.parse_args()

    from nsdp_tpu.data.synthetic import (
        generate_synthetic_dataset,
        synthetic_config,
    )

    print("== generating synthetic dataset ==")
    fixture = generate_synthetic_dataset(
        os.path.join(args.workdir, "data"),
        n_identities=2,
        n_motions_per_identity=1,
        n_frames=4,
        n_surface=400,
        n_space=500,
    )
    cfg = synthetic_config(fixture, model_type="forward")
    cfg["experiment"]["out_dir"] = os.path.join(args.workdir, "out")
    cfg["training"]["epochs"] = args.epochs
    cfg["training"]["save_frequency"] = max(args.epochs - 1, 1)
    cfg["validation"]["frequency"] = max(args.epochs - 1, 1)
    cfg_path = os.path.join(args.workdir, "quickstart.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    print("== training (stage-1 forward net) ==")
    import train as train_cli

    train_cli.main([cfg_path, "--seed", "0"])

    print("== evaluating + writing meshes ==")
    exp_dir = os.path.join(cfg["experiment"]["out_dir"], "synthetic")
    latest = sorted(
        f for f in os.listdir(exp_dir) if f.startswith("model_")
    )[-1]
    cfg["test"]["weight_file"] = os.path.join(exp_dir, latest)
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from nsdp_tpu.utils.logger import StatsLogger

    StatsLogger.reset()
    import test as test_cli

    test_cli.main([cfg_path])

    mesh_dir = os.path.join(
        exp_dir, cfg["test"]["motion_split"], "meshes", "deformed"
    )
    print(f"\nDone. Deformed meshes in: {mesh_dir}")
    print("Files:", os.listdir(mesh_dir))


if __name__ == "__main__":
    main()
