#!/usr/bin/env python
"""Evaluate a deformation network (CLI-compatible with the reference test.py).

Per test pair (batch 1): deform the surface samples and the full-resolution
vertices, compute l2 / fnc / cd metrics (values > 1.0 dropped from the
aggregate, as in the reference), and export meshes / point clouds.
"""

import argparse
import os
import sys

import numpy as np


def parse_args(argv):
    parser = argparse.ArgumentParser(description="Evaluate a deformation network")
    parser.add_argument("config_file", help="experiment configuration YAML")
    parser.add_argument("--num_workers", type=int, default=0)
    parser.add_argument("--num_threads", type=int, default=4)
    parser.add_argument("--matmul_precision", default="default",
                        choices=["default", "high", "highest"])
    return parser.parse_args(argv)


def main(argv):
    args = parse_args(argv)

    import jax
    jax.config.update("jax_default_matmul_precision", args.matmul_precision)
    import jax.numpy as jnp

    from nsdp_tpu.data import DataLoader, dataset_dict
    from nsdp_tpu.models import build_model
    from nsdp_tpu.training import create_train_state, make_steps, optimizer_factory
    from nsdp_tpu.training.checkpoints import load_model_variables
    from nsdp_tpu.utils.config import load_config
    from nsdp_tpu.utils.generation import generate_meshes, generate_pointclouds
    from nsdp_tpu.utils.logger import StatsLogger
    from nsdp_tpu.utils.metrics import compute_evaluation_metrics
    from nsdp_tpu.training.steps import test_on_batch

    print("Running on", jax.devices())
    config = load_config(args.config_file)

    output_directory = config["experiment"]["out_dir"]
    experiment_name = config["experiment"]["name"]
    experiment_directory = os.path.join(output_directory, experiment_name)
    os.makedirs(experiment_directory, exist_ok=True)

    Dataset = dataset_dict[config["data"]["type"]]
    test_dataset = Dataset(
        config,
        iden_split=config["test"]["iden_split"],
        motion_split=config["test"]["motion_split"],
        load_mesh=config["test"]["load_mesh"],
        num_sampled_pairs=config["test"]["num_sampled_pairs"],
    )
    test_loader = DataLoader(
        test_dataset,
        batch_size=config["test"].get("batch_size", 1),
        shuffle=False,
        num_workers=args.num_workers,
    )
    print(f"Loaded {len(test_dataset)} test deformation pairs")

    model_type = config["model"]["type"]
    model = build_model(config)
    _, tx = optimizer_factory(config.get("training", {}))
    steps = make_steps(model, model_type, tx)

    item0 = test_dataset[0]
    inputs0 = jnp.asarray(item0["surface_samples_inputs"])[None]
    pts0 = jnp.asarray(item0["surface_samples_src"])[None]
    if model_type == "arbitrary":
        example = (pts0, inputs0[..., 0:3], inputs0[..., 3:6], inputs0[..., 6:7])
    else:
        example = (pts0, inputs0)
    state = create_train_state(model, jax.random.PRNGKey(0), example, tx)

    weight_file = config["test"].get("weight_file")
    if weight_file:
        print(f"Loading weight file from {weight_file}")
        state = load_model_variables(weight_file, state)

    # fused Pallas inference path on TPU (flax path elsewhere / other
    # archs; NSDP_FAST_PREDICT=1/0 overrides — see fast_predict_enabled)
    fast_predict = None
    from nsdp_tpu.models.fast_predict import (
        fast_predict_enabled,
        make_fast_predict,
    )

    if fast_predict_enabled(config):
        fast_predict = make_fast_predict(
            model,
            {"params": state.params, "batch_stats": state.batch_stats},
            model_type,
            nneigh=config["model"]["decoder_kwargs"].get("nneigh", 7),
            # compiled kernels on TPU; interpreter mode when the override
            # forces the fused path onto CPU (tests)
            interpret=jax.default_backend() not in ("tpu", "axon"),
        )

    logger = StatsLogger.instance()
    logger.add_output_file(
        open(
            os.path.join(
                experiment_directory,
                "{}.txt".format(config["test"]["motion_split"]),
            ),
            "w",
        )
    )

    gen_mesh_dir = gen_pc_dir = None
    if config["test"]["generate_mesh"]:
        gen_mesh_dir = os.path.join(
            experiment_directory,
            config["test"]["motion_split"],
            config["test"]["mesh_folder"],
        )
        os.makedirs(gen_mesh_dir, exist_ok=True)
        print(f"Save generated meshes in {gen_mesh_dir}")
    if config["test"]["generate_pointcloud"]:
        gen_pc_dir = os.path.join(
            experiment_directory,
            config["test"]["motion_split"],
            config["test"]["pointcloud_folder"],
        )
        os.makedirs(gen_pc_dir, exist_ok=True)
        print(f"Save generated pointclouds in {gen_pc_dir}")

    from nsdp_tpu.data.loader import split_batch

    print("====> Inference / Test ====>")
    for b, batch in enumerate(test_loader):
        loss, batch = test_on_batch(
            steps, state, batch, compute_loss=True,
            fast_predict=fast_predict,
        )

        # metrics and mesh/pointcloud writers operate on one pair at a
        # time (reference runs batch_size 1, test.py:81-87); the device
        # eval above is batched, the host post-processing splits
        for sample in split_batch(batch):
            eval_dict = compute_evaluation_metrics(sample)
            for k, v in eval_dict.items():
                if v <= 1.0:
                    logger[k].value = v

            sample_idx = int(np.asarray(sample["index"]).squeeze())
            meta_data = test_dataset.get_metadata(sample_idx)
            if gen_mesh_dir:
                generate_meshes(
                    gen_mesh_dir, sample, meta_data,
                    config["test"]["mesh_format"], vert_pred_color=True,
                )
            if gen_pc_dir:
                generate_pointclouds(
                    gen_pc_dir, sample, meta_data,
                    config["test"]["pointcloud_format"],
                )
        logger.print_progress(-1, b + 1, loss)

    logger.clear()
    print("====> Inference / Test ====>")


if __name__ == "__main__":
    main(sys.argv[1:])
