#!/usr/bin/env python
"""Train a deformation network (CLI-compatible with the reference train.py).

Usage:
  python train.py <config.yaml> [--num_workers N] [--seed S]
                  [--continue_from_epoch E] [--best_val_loss L]
                  [--with_wandb_logger]

Differences from the reference runner are all TPU-native: the per-batch
closure is one jitted XLA program (forward+loss+backward+update), batches are
sharded over the device mesh's 'data' axis, and checkpoints are flax msgpack
under the same file-naming contract.
"""

import argparse
import os
import sys

import numpy as np


def parse_args(argv):
    parser = argparse.ArgumentParser(description="Train a deformation network")
    parser.add_argument("config_file", help="experiment configuration YAML")
    parser.add_argument("--num_workers", type=int, default=0,
                        help="loader worker threads")
    parser.add_argument("--num_threads", type=int, default=4,
                        help="host compute threads (accepted for parity)")
    parser.add_argument("--seed", type=int, default=27, help="PRNG seed")
    parser.add_argument("--continue_from_epoch", type=int, default=0)
    parser.add_argument("--best_val_loss", type=float, default=9999999999999)
    parser.add_argument("--with_wandb_logger", action="store_true")
    parser.add_argument("--matmul_precision", default="default",
                        choices=["default", "high", "highest"],
                        help="f32 matmul precision of the XLA path on the "
                        "MXU (distance computations pin HIGHEST internally; "
                        "'highest' here is ~4x slower per step — use it for "
                        "bit-level parity runs)")
    parser.add_argument("--profile_dir", default=None,
                        help="write a jax.profiler trace of epoch 0's first "
                        "steps to this directory")
    return parser.parse_args(argv)


def main(argv):
    args = parse_args(argv)

    import jax
    jax.config.update("jax_default_matmul_precision", args.matmul_precision)
    import jax.numpy as jnp

    from nsdp_tpu.data import DataLoader, dataset_dict
    from nsdp_tpu.models import build_model
    from nsdp_tpu.parallel import (
        globalize_batch,
        initialize_distributed,
        is_main_process,
        local_slice,
        make_train_mesh,
        process_batch_slice,
        replicate,
    )
    from nsdp_tpu.training import (
        create_train_state,
        load_best_checkpoints,
        load_checkpoints,
        make_steps,
        optimizer_factory,
        print_num_parameters,
    )
    from nsdp_tpu.training.async_ckpt import AsyncCheckpointer
    from nsdp_tpu.training.checkpoints import load_model_variables
    from nsdp_tpu.utils.padding import pad_batch
    from nsdp_tpu.utils.config import load_config, save_experiment_params
    from nsdp_tpu.utils.logger import StatsLogger, WandB

    np.random.seed(args.seed)
    # Multi-host: no-op on a single host; on a pod slice this must run
    # before the first device query so every process sees the global
    # topology (SURVEY.md §2.9 "per-host data loading over DCN").
    initialize_distributed()
    n_proc = jax.process_count()
    main_proc = is_main_process()
    print(f"Running on {jax.devices()} ({n_proc} process(es))")

    config = load_config(args.config_file)
    output_directory = config["experiment"]["out_dir"]
    experiment_name = config["experiment"]["name"]
    experiment_directory = os.path.join(output_directory, experiment_name)
    os.makedirs(experiment_directory, exist_ok=True)
    if main_proc:
        save_experiment_params(
            args, experiment_name, experiment_directory, config
        )
        print(f"Save experiment statistics in {experiment_directory}")

    # datasets + loaders
    Dataset = dataset_dict[config["data"]["type"]]
    train_dataset = Dataset(
        config,
        iden_split=config["training"]["iden_split"],
        motion_split=config["training"]["motion_split"],
        load_mesh=config["training"]["load_mesh"],
        num_sampled_pairs=config["training"]["num_sampled_pairs"],
    )
    validation_dataset = Dataset(
        config,
        iden_split=config["validation"]["iden_split"],
        motion_split=config["validation"]["motion_split"],
        load_mesh=config["validation"]["load_mesh"],
        num_sampled_pairs=config["validation"]["num_sampled_pairs"],
    )
    batch_size = config["training"].get("batch_size", 16)
    # Multi-host input sharding: every process draws the same shuffled index
    # order (same seed) and assembles only its slice of each global batch;
    # globalize_batch stitches the host shards into one global array so DCN
    # carries only input data, never gradients.  Single-process the slice is
    # the whole batch.
    train_loader = DataLoader(
        train_dataset, batch_size=batch_size, shuffle=True,
        drop_last=True, num_workers=args.num_workers, seed=args.seed,
        batch_slice=process_batch_slice(batch_size) if n_proc > 1 else None,
    )
    print(f"Loaded {len(train_dataset)} training deformation pairs")
    # drop_last=False: the reference evaluates every validation sample
    # (torch default); the trailing partial batch is padded + masked below.
    val_batch_size = config["validation"].get("batch_size", 1)
    val_loader = DataLoader(
        validation_dataset,
        batch_size=val_batch_size,
        shuffle=False, drop_last=False, num_workers=args.num_workers,
    )
    print(f"Loaded {len(validation_dataset)} validation deformation pairs")

    # mesh: data-parallel over as many chips as divide the TRAIN batch;
    # validation batches are padded up to a multiple of the mesh's data axis
    # (a val batch_size of 1 must not silently shrink training to one chip).
    mesh = make_train_mesh(batch_size)
    data_axis = mesh.shape["data"]
    val_target = -(-val_batch_size // data_axis) * data_axis

    # model + optimizer + state.  The mesh is passed to make_steps so the
    # multi-device steps run under shard_map (the Pallas kernels cannot be
    # partitioned by GSPMD; see training/steps.py).
    model_type = config["model"]["type"]
    model = build_model(config)
    lr_schedule, tx = optimizer_factory(config["training"])
    steps = make_steps(
        model, model_type, tx,
        nan_guard=config["training"].get("nan_guard", False),
        mesh=mesh,
    )

    example_batch = train_dataset.collate_fn(
        [train_dataset[i] for i in range(min(2, len(train_dataset)))]
    )
    inputs = jnp.asarray(example_batch["surface_samples_inputs"])
    if model_type == "arbitrary":
        example = (
            jnp.asarray(example_batch["space_samples_src"]),
            inputs[..., 0:3], inputs[..., 3:6], inputs[..., 6:7],
        )
    else:
        example = (jnp.asarray(example_batch["space_samples_src"]), inputs)
    state = create_train_state(model, jax.random.PRNGKey(args.seed), example, tx)
    print_num_parameters(state.params, model_type)

    # pretrained stage-1 nets for the arbitrary model (same config keys)
    wf = config["training"].get("weight_forward_file")
    wb = config["training"].get("weight_backward_file")
    if model_type == "arbitrary" and (wf or wb):
        from nsdp_tpu.training.partial_load import load_subnetwork
        if wf:
            print(f"Loading weight forward file from {wf}")
            state = load_subnetwork(state, wf, "model_deform")
        if wb:
            print(f"Loading weight backward file from {wb}")
            state = load_subnetwork(state, wb, "model_canonicalize")
    weight_file = config["training"].get("weight_file")
    if weight_file:
        print(f"Loading weight file from {weight_file}")
        state = load_model_variables(weight_file, state)

    # resume
    state, _, _ = load_best_checkpoints(state, experiment_directory, args)
    state, _ = load_checkpoints(state, experiment_directory, args)

    print(
        f"Training mesh: {dict(mesh.shape)} "
        f"(validation batches padded {val_batch_size} -> {val_target})"
    )
    state = replicate(state, mesh)

    # The watch flag must be identical on EVERY process: steps['watch_stats']
    # is a global-mesh collective (shard_map pmean over 'data'), so if only
    # process 0 called it the psum would deadlock in multi-host training.
    # Derive it from args+config (not from WandB.instance(), which only
    # exists on the main process); gate only the logging below.
    wandb_watch = bool(
        args.with_wandb_logger
        and config.get("logger", {}).get("watch", True)
    )
    watch_every = config.get("logger", {}).get("log_frequency", 10)
    if args.with_wandb_logger and main_proc:
        # watch defaults ON, like the reference's wandb.watch(model)
        # (reference utils/logger.py:102-103; train.py:166-172)
        WandB.instance().init(
            config,
            model=None,
            project=config.get("logger", {}).get("project", "NSDP"),
            name=experiment_name,
            watch=wandb_watch,
            log_frequency=watch_every,
        )
    logger = StatsLogger.instance()
    if main_proc:
        logger.add_output_file(
            open(os.path.join(experiment_directory, "stats.txt"), "w")
        )

    epochs = config["training"].get("epochs", 1000)
    save_every = config["training"].get("save_frequency", 20)
    val_every = config["validation"].get("frequency", 10)

    from nsdp_tpu.utils.profiling import StepTimer, trace_steps

    timer = StepTimer()
    checkpointer = AsyncCheckpointer()  # never block training on ckpt IO
    for epoch in range(args.continue_from_epoch, epochs):
        lr = lr_schedule.get_learning_rate(epoch)
        profile_this_epoch = args.profile_dir and epoch == args.continue_from_epoch
        with trace_steps(args.profile_dir if profile_this_epoch else None):
            # Deferred loss fetch: float(loss) blocks on the device, so
            # reading step b's loss only after dispatching step b+1 keeps
            # the host one step ahead and the device queue never drains
            # (same values reach the logger, printed one step late).
            pending = None
            for b, batch in enumerate(train_loader):
                batch = globalize_batch(batch, mesh)
                state, loss = steps["train_step"](state, batch, lr)
                if pending is not None:
                    pb, pl = pending
                    timer.tick()
                    logger["steps_per_sec"].value = timer.steps_per_sec
                    logger.print_progress(epoch + 1, pb + 1, float(pl))
                pending = (b, loss)
            if pending is not None:
                pb, pl = pending
                timer.tick()
                logger["steps_per_sec"].value = timer.steps_per_sec
                logger.print_progress(epoch + 1, pb + 1, float(pl))

        if (
            wandb_watch
            and pending is not None
            and (epoch % max(1, watch_every)) == 0
        ):
            # param/grad-norm histograms every `log_frequency` epochs (the
            # wandb.watch log_freq equivalent): one extra grad pass on the
            # epoch's last batch.  watch_stats is a mesh collective —
            # EVERY process must call it; only process 0 logs the result.
            watch = jax.device_get(steps["watch_stats"](state, batch))
            if main_proc:
                logger.log_watch(*watch)

        if (epoch % save_every) == 0 and main_proc:
            checkpointer.save(epoch, state, experiment_directory)
        logger.clear()

        if epoch % val_every == 0 and epoch > 0:
            print("====> Validation Epoch ====>")
            for b, batch in enumerate(val_loader):
                # validation batches are assembled whole on every process
                # (cheap at val batch sizes), padded, then cut down to the
                # local rows before globalizing
                batch, sample_mask = pad_batch(batch, val_target)
                if n_proc > 1:
                    batch = local_slice(batch, val_target)
                    sample_mask = local_slice(
                        {"m": sample_mask}, val_target
                    )["m"]
                batch = globalize_batch(batch, mesh)
                sample_mask = globalize_batch({"m": sample_mask}, mesh)["m"]
                loss = steps["validate_step_masked"](
                    state, batch, sample_mask
                )
                logger.print_progress(-1, b + 1, float(loss))
            val_loss = logger.loss
            if val_loss < args.best_val_loss:
                if main_proc:
                    checkpointer.save_best(
                        epoch, state, experiment_directory, val_loss
                    )
                args.best_val_loss = val_loss
            logger.clear()
            print("====> Validation Epoch ====>")
    checkpointer.wait()


if __name__ == "__main__":
    main(sys.argv[1:])
