#!/usr/bin/env python
"""Interactive handle-based editing (CLI-compatible with the reference run.py).

Same skeleton as test.py but: the dataset synthesises the target pose from
the configured user handle (head / tail / foot translation), no metrics are
computed, and the output folder name encodes the handle + translation
(``drag_head_x-0.15y-0.20z-0.20_ratio0.10``).
"""

import argparse
import os
import sys

import numpy as np


def parse_args(argv):
    parser = argparse.ArgumentParser(
        description="Handle-based shape editing with a deformation prior"
    )
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
    from nsdp_tpu.utils.generation import (
        define_userhandle_folder_name,
        generate_meshes,
        generate_pointclouds,
    )
    from nsdp_tpu.utils.logger import StatsLogger
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
    print(f"Loaded {len(test_dataset)} editing samples")

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

    # NSDP_FAST_PREDICT=1/0 overrides the backend gate (fast_predict_enabled)
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

    # output folders named from the user-handle configuration
    userhandle_dirname = define_userhandle_folder_name(config)
    gen_mesh_dir = gen_pc_dir = None
    if config["test"]["generate_mesh"]:
        gen_mesh_dir = os.path.join(
            experiment_directory, userhandle_dirname,
            config["test"]["mesh_folder"],
        )
        os.makedirs(gen_mesh_dir, exist_ok=True)
        print(f"Save generated meshes in {gen_mesh_dir}")
    if config["test"]["generate_pointcloud"]:
        gen_pc_dir = os.path.join(
            experiment_directory, userhandle_dirname,
            config["test"]["pointcloud_folder"],
        )
        os.makedirs(gen_pc_dir, exist_ok=True)
        print(f"Save generated pointclouds in {gen_pc_dir}")

    from nsdp_tpu.data.loader import split_batch

    logger = StatsLogger.instance()
    print("====> Interactive Editing ====>")
    for b, batch in enumerate(test_loader):
        _, batch = test_on_batch(
            steps, state, batch, compute_loss=False,
            fast_predict=fast_predict,
        )
        logger.print_progress(-1, b + 1, 0.0)

        # device eval is batched; the host mesh/pointcloud writers take
        # one pair at a time (same split as test.py)
        for sample in split_batch(batch):
            sample_idx = int(np.asarray(sample["index"]).squeeze())
            meta_data = test_dataset.get_metadata(sample_idx)
            if gen_mesh_dir:
                generate_meshes(
                    gen_mesh_dir, sample, meta_data,
                    config["test"]["mesh_format"], vert_pred_color=False,
                )
            if gen_pc_dir:
                generate_pointclouds(
                    gen_pc_dir, sample, meta_data,
                    config["test"]["pointcloud_format"],
                )

    logger.clear()
    print("====> Interactive Editing ====>")


if __name__ == "__main__":
    main(sys.argv[1:])
