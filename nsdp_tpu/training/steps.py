"""Jitted train / validate / test steps.

The reference exposes per-model-type closures
(``train/validate/test_on_batch_with_cano`` in
``model/deformation_networks.py:63-109`` and ``..._with_arbitrary`` in
``model/flow_arbitrary.py:30-85``).  Here each becomes a single jitted
function: forward, loss, backward and the optimizer update all trace into one
XLA program; the train step donates the state buffers so parameters are
updated in place on device.

Batch dict contract (same keys the reference datasets emit):
  * ``surface_samples_inputs`` (B, N, 7)
  * ``space_samples_src`` / ``space_samples_tgt`` (B, Q, 3)
"""

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from nsdp_tpu.models.deformation import compute_l2_error
from nsdp_tpu.nn.blocks import BN_MOMENTUM, bn_sync_axis
from nsdp_tpu.training.state import TrainState


def _double_bn_update(new_stats, old_stats):
    """Compound a second identical BN running-stat EMA update.

    The reference's stage-2 step calls ``model_canonicalize`` twice with the
    same conditioning (``model/flow_arbitrary.py:19-20``), so its encoder's
    BatchNorm running stats receive TWO sequential EMA updates with the same
    batch statistic each step.  The encode-once composition here
    (``models/deformation.py`` FlowArbitrary) computes one update
    ``new = m*old + (1-m)*batch``; the compounded second update is
    ``m*new + (1-m)*batch = (1+m)*new - m*old`` — exact, no extra encoder
    pass.  Gradients need no correction: one encoding feeding both decodes
    accumulates the same total gradient as two identical encode calls.
    """
    m = BN_MOMENTUM
    return jax.tree.map(lambda n, o: (1.0 + m) * n - m * o, new_stats, old_stats)


def _split_inputs(surface_samples_inputs):
    """7-channel conditioning -> (src xyz, tgt xyz, handle mask)."""
    return (
        surface_samples_inputs[:, :, 0:3],
        surface_samples_inputs[:, :, 3:6],
        surface_samples_inputs[:, :, 6:7],
    )


def make_steps(model, model_type: str, tx, nan_guard: bool = False,
               mesh=None) -> Dict[str, Any]:
    """Build the jitted step functions for a model.

    Args:
      model: bound-free flax module (DeformationNetwork or FlowArbitrary).
      model_type: 'forward' | 'backward' | 'arbitrary'.
      tx: LR-less optax transformation from ``optimizer_factory``.
      nan_guard: skip the parameter/optimizer update (keeping the previous
        state) whenever the batch loss is non-finite — a production
        failure-detection guard absent in the reference; the bad loss is
        still returned so the logger surfaces it.
      mesh: optional ``('data','query')`` device mesh.  With a multi-device
        mesh, every step is ``shard_map``-ped: batches split over 'data'
        (predict queries additionally over 'query'), parameters replicated,
        gradients/losses combined with explicit ``psum``s and BatchNorm
        statistics synced globally (:func:`nsdp_tpu.nn.blocks.bn_sync_axis`)
        — exact single-device semantics.  shard_map (not jit+GSPMD) is load-
        bearing on TPU: the fused Pallas attention and FPS kernels lower to
        mosaic custom calls GSPMD cannot partition (it would all-gather the
        operands and replicate the kernel on every chip); under shard_map
        each device runs the kernels on its local shard.  Requires batch
        divisible by the 'data' axis and query counts divisible by 'query'.

    Returns:
      dict with ``train_step(state, batch, lr)``, ``validate_step(state,
      batch)``, and ``predict(state, points, surface_samples_inputs)`` (the
      deformation-field evaluation used by test/run).
    """
    arbitrary = model_type == "arbitrary"
    sharded = mesh is not None and mesh.devices.size > 1
    if sharded:
        from jax.sharding import PartitionSpec as P

        from nsdp_tpu.parallel.mesh import shard_map

    def forward(params, batch_stats, points, surface_samples_inputs, train,
                point_mask=None):
        variables = {"params": params, "batch_stats": batch_stats}
        if arbitrary:
            src, tgt, mask = _split_inputs(surface_samples_inputs)
            args = (points, src, tgt, mask)
        else:
            args = (points, surface_samples_inputs)
        if train:
            return model.apply(
                variables, *args, train=True, point_mask=point_mask,
                mutable=["batch_stats"]
            )
        return model.apply(
            variables, *args, train=False, point_mask=point_mask
        ), None

    def loss_fn(params, batch_stats, batch):
        pred, mutated = forward(
            params,
            batch_stats,
            batch["space_samples_src"],
            batch["surface_samples_inputs"],
            train=True,
            point_mask=batch.get("surface_valid_mask"),
        )
        loss = compute_l2_error(pred, batch["space_samples_tgt"])
        new_stats = mutated["batch_stats"]
        if arbitrary:
            new_stats = dict(new_stats)
            new_stats["model_canonicalize"] = dict(
                new_stats["model_canonicalize"]
            )
            new_stats["model_canonicalize"]["encoder"] = _double_bn_update(
                new_stats["model_canonicalize"]["encoder"],
                batch_stats["model_canonicalize"]["encoder"],
            )
        return loss, new_stats

    def _grad_fn(params, batch_stats, batch):
        return jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, batch
        )

    if sharded:
        def _sharded_grad_body(params, batch_stats, batch):
            # runs per-device on the local batch shard; sync-BN makes the
            # forward itself see global batch statistics, the psums below
            # combine loss and gradients (mean over equal-size shards ==
            # global batch mean)
            with bn_sync_axis("data"):
                (loss, new_stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, batch_stats, batch)
            loss, grads = jax.lax.pmean((loss, grads), "data")
            return (loss, new_stats), grads

        _grad_fn = shard_map(
            _sharded_grad_body,
            mesh=mesh,
            in_specs=(P(), P(), P("data")),
            out_specs=((P(), P()), P()),
        )

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, lr):
        (loss, new_stats), grads = _grad_fn(
            state.params, state.batch_stats, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        if nan_guard:
            ok = jnp.isfinite(loss)
            pick = lambda new, old: jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new, old
            )
            params = pick(params, state.params)
            new_stats = pick(new_stats, state.batch_stats)
            opt_state = pick(opt_state, state.opt_state)
        return (
            TrainState(
                params=params,
                batch_stats=new_stats,
                opt_state=opt_state,
                step=state.step + 1,
            ),
            loss,
        )

    def _val_loss(params, batch_stats, batch):
        pred, _ = forward(
            params,
            batch_stats,
            batch["space_samples_src"],
            batch["surface_samples_inputs"],
            train=False,
            point_mask=batch.get("surface_valid_mask"),
        )
        return compute_l2_error(pred, batch["space_samples_tgt"])

    def _val_masked_sums(params, batch_stats, batch, sample_mask):
        pred, _ = forward(
            params,
            batch_stats,
            batch["space_samples_src"],
            batch["surface_samples_inputs"],
            train=False,
            point_mask=batch.get("surface_valid_mask"),
        )
        delta = pred - batch["space_samples_tgt"]
        per_sample = jnp.mean(0.5 * jnp.sum(delta * delta, axis=-1), axis=-1)
        return jnp.sum(per_sample * sample_mask), jnp.sum(sample_mask)

    def _predict_impl(params, batch_stats, points, surface_samples_inputs,
                      point_mask):
        pred, _ = forward(
            params, batch_stats, points, surface_samples_inputs,
            train=False, point_mask=point_mask,
        )
        return pred

    if sharded:
        _val_fn = shard_map(
            lambda p, s, b: jax.lax.pmean(_val_loss(p, s, b), "data"),
            mesh=mesh, in_specs=(P(), P(), P("data")), out_specs=P(),
        )

        def _val_masked_body(params, batch_stats, batch, sample_mask):
            num, den = jax.lax.psum(
                _val_masked_sums(params, batch_stats, batch, sample_mask),
                "data",
            )
            return num / jnp.maximum(den, 1.0)

        _val_masked_fn = shard_map(
            _val_masked_body, mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data")), out_specs=P(),
        )
        # queries additionally split over the 'query' axis (field evaluation
        # is embarrassingly parallel given the per-sample encoding)
        _pred_nomask = shard_map(
            lambda p, s, pts, ins: _predict_impl(p, s, pts, ins, None),
            mesh=mesh,
            in_specs=(P(), P(), P("data", "query"), P("data")),
            out_specs=P("data", "query"),
        )
        _pred_mask = shard_map(
            _predict_impl, mesh=mesh,
            in_specs=(P(), P(), P("data", "query"), P("data"), P("data")),
            out_specs=P("data", "query"),
        )
    else:
        _val_fn = _val_loss

        def _val_masked_fn(params, batch_stats, batch, sample_mask):
            num, den = _val_masked_sums(params, batch_stats, batch, sample_mask)
            return num / jnp.maximum(den, 1.0)

    @jax.jit
    def validate_step(state: TrainState, batch):
        return _val_fn(state.params, state.batch_stats, batch)

    @jax.jit
    def validate_step_masked(state: TrainState, batch, sample_mask):
        """Validation loss over real samples only (pad+mask, no drop_last).

        The reference evaluates every validation sample (torch DataLoader
        default ``drop_last=False``, reference ``train.py:130-136``); jit
        needs static shapes, so the trailing partial batch is padded to the
        full batch size and ``sample_mask`` (B,) zeroes the padded rows out
        of the mean — the masked mean over real samples equals torch's mean
        over the smaller final batch.
        """
        return _val_masked_fn(
            state.params, state.batch_stats, batch, sample_mask
        )

    @jax.jit
    def watch_stats(state: TrainState, batch):
        """Per-module parameter/gradient L2 norms + per-leaf norm vectors.

        The flax equivalent of the reference's ``wandb.watch(model)``
        histograms (reference ``utils/logger.py:102-103``): run one
        grad pass on the given batch (sharded exactly like ``train_step``)
        and reduce each top-level module subtree to its global norm, plus
        a flat vector of every leaf's norm for histogram logging.
        """
        (_, _), grads = _grad_fn(state.params, state.batch_stats, batch)

        def tree_norms(tree):
            top = {k: optax.global_norm(v) for k, v in tree.items()}
            leaves = jnp.stack(
                [jnp.linalg.norm(l.ravel()) for l in jax.tree.leaves(tree)]
            )
            return top, leaves

        return tree_norms(state.params), tree_norms(grads)

    @jax.jit
    def predict(state: TrainState, points, surface_samples_inputs,
                point_mask=None):
        """Evaluate the deformation field at arbitrary query points."""
        if sharded:
            if point_mask is None:
                return _pred_nomask(
                    state.params, state.batch_stats, points,
                    surface_samples_inputs,
                )
            return _pred_mask(
                state.params, state.batch_stats, points,
                surface_samples_inputs, point_mask,
            )
        return _predict_impl(
            state.params, state.batch_stats, points, surface_samples_inputs,
            point_mask,
        )

    return {
        "train_step": train_step,
        "validate_step": validate_step,
        "validate_step_masked": validate_step_masked,
        "predict": predict,
        "watch_stats": watch_stats,
    }


def test_on_batch(
    steps,
    state,
    batch,
    compute_loss: bool = True,
    fast_predict=None,
    bucket: int = 4096,
):
    """Reference ``test_on_batch_*`` semantics: predict deformed surface
    samples and deformed full-resolution vertices, stash them in the batch
    dict, optionally compute the vertex L2 loss.  This is the shared
    per-batch eval used by ``test.py`` and ``run.py``.

    For the 'arbitrary' model the queried source points are the *surface*
    samples (not space samples); for forward/backward they are too
    (reference ``deformation_networks.py:91-109``, ``flow_arbitrary.py:66-85``).

    Variable-size vertex queries are bucket-padded (exact: padded queries
    are sliced off, see ``utils/padding.py``).  When ``fast_predict`` (the
    fused Pallas path from ``models.fast_predict``, built without a mesh so
    the mask argument is optional) is given, both evaluations route through
    it — padded partial-shape batches (a ``surface_valid_mask``) pass the
    mask as the third argument.
    """
    import numpy as np

    from nsdp_tpu.utils.padding import predict_padded

    inputs = batch["surface_samples_inputs"]
    surf_src = inputs[:, :, 0:3]
    point_mask = batch.get("surface_valid_mask")
    if fast_predict is not None:
        predictor = fast_predict
        args = (jnp.asarray(surf_src), jnp.asarray(inputs))
        if point_mask is not None:
            args += (jnp.asarray(point_mask),)
        batch["surface_samples_tgt_pred"] = np.asarray(fast_predict(*args))
    else:
        predictor = steps
        batch["surface_samples_tgt_pred"] = np.asarray(
            steps["predict"](state, surf_src, inputs, point_mask)
        )
    if "verts_src" in batch:
        batch["verts_tgt_pred"] = predict_padded(
            predictor, state, batch["verts_src"], inputs, bucket,
            point_mask=point_mask,
        )
        if compute_loss and "verts_tgt" in batch:
            mask = batch.get("verts_valid_mask")
            pred = jnp.asarray(batch["verts_tgt_pred"])
            tgt = jnp.asarray(batch["verts_tgt"])
            if mask is not None:
                delta2 = 0.5 * jnp.sum((pred - tgt) ** 2, axis=-1) * mask
                loss = jnp.sum(delta2) / jnp.maximum(jnp.sum(mask), 1.0)
            else:
                loss = compute_l2_error(pred, tgt)
            return float(loss), batch
    return 0.0, batch
