"""Inference fast path: flax encoders + fused Pallas decoders.

``make_fast_predict(model, variables, model_type)`` returns a jitted
``predict(points, surface_samples_inputs)`` numerically equivalent to the
standard eval path (``training.steps`` predict) but routing every decoder
evaluation through :func:`nsdp_tpu.models.fast_decoder.decode_fast`, and
encoding each conditioning cloud exactly once.  Used by serving/benchmark.
(Training uses the fused kernels too, via their custom VJP — see
``ops/attention_pallas.py`` and the ``fused_attention`` config key; this
module is only the *inference* composition, which additionally skips the
Dekker self-delta roll on the cross-attention path.)

Multi-chip: pass ``mesh`` (a ``('data','query')`` mesh from
``nsdp_tpu.parallel.make_mesh``) and the whole predict is ``shard_map``-ped:
each device encodes its batch shard and decodes its query shard — the field
evaluation is embarrassingly parallel given the encoding, so no collectives
are needed until the (XLA-inserted) output gather.  The Pallas kernels run
per-device on local shards, so the single-chip qps number scales with the
mesh.  Batch must divide the 'data' axis and Q the 'query' axis (serving
pads queries to buckets anyway, see ``utils/padding.py``).
"""

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nsdp_tpu.models.fast_decoder import decode_fast
from nsdp_tpu.models.fast_encoder import encode_fast
from nsdp_tpu.models.encoders import PointTransformerEncoder


def fast_predict_enabled(config) -> bool:
    """Should the CLIs (test.py / run.py) route eval through this path?

    The fused kernels exist only for the flagship encoder/decoder pair.
    On TPU-class backends they are the shipped eval path; elsewhere the
    flax path runs.  ``NSDP_FAST_PREDICT=1`` forces the fused path on any
    backend (CPU runs the kernels in interpreter mode — the CLI-level
    fused-path tests use this), ``NSDP_FAST_PREDICT=0`` forces the flax
    path anywhere.
    """
    import os

    arch_ok = (
        config["model"]["decoder"] == "crossatten"
        and config["model"]["encoder"] == "pointransformer"
    )
    override = os.environ.get("NSDP_FAST_PREDICT")
    if override is not None:
        falsy = ("0", "", "false", "no", "off")
        return arch_ok and override.strip().lower() not in falsy
    return arch_ok and jax.default_backend() in ("tpu", "axon")


def _encode(encoder, params, batch_stats, conditioning, interpret,
            compute_dtype=None, point_mask=None):
    """Fused raw-param encoder when available, flax apply otherwise."""
    if isinstance(encoder, PointTransformerEncoder):
        return encode_fast(
            encoder, params, batch_stats, conditioning, interpret=interpret,
            compute_dtype=compute_dtype, point_mask=point_mask,
        )
    return encoder.apply(
        {"params": params, "batch_stats": batch_stats},
        conditioning,
        False,
        point_mask,
    )


def _encoder_apply(net, variables, prefix, conditioning, interpret=False,
                   compute_dtype=None, point_mask=None):
    return _encode(
        net.encoder,
        variables["params"][prefix]["encoder"],
        variables["batch_stats"][prefix]["encoder"],
        conditioning,
        interpret,
        compute_dtype,
        point_mask,
    )


def make_fast_arbitrary_halves(
    model, nneigh: int = 7, interpret: bool = False, compute_dtype=None,
) -> Dict[str, Any]:
    """The FlowArbitrary composition split at the canonical pose.

    The backward (canonicalisation) half depends ONLY on the source surface
    — in interactive editing the source is fixed while the user drags
    handles, so a session runs ``canonicalize`` once and only ``deform``
    per drag (the reference re-runs all three net passes every time,
    ``model/flow_arbitrary.py:15-27``).  ``predict == deform ∘
    canonicalize`` exactly; see ``serving.DeformationService.edit_session``.

    Returns ``{'canonicalize': f(variables, points, surf_src) ->
    (space_cano, surf_cano), 'deform': f(variables, space_cano, surf_cano,
    surf_tgt, mask) -> deformed}`` (un-jitted impls; callers jit/shard).
    """
    bwd = model.model_canonicalize
    fwd = model.model_deform

    def canonicalize(variables, points, surf_src, point_mask=None):
        enc_b = _encoder_apply(
            bwd, variables, "model_canonicalize", surf_src, interpret,
            compute_dtype, point_mask,
        )
        bwd_dec = variables["params"]["model_canonicalize"]["decoder"]
        space_cano = decode_fast(
            bwd_dec, points, enc_b, nneigh=nneigh, interpret=interpret,
            compute_dtype=compute_dtype,
        )
        surf_cano = decode_fast(
            bwd_dec, surf_src, enc_b, nneigh=nneigh, interpret=interpret,
            compute_dtype=compute_dtype,
        )
        if point_mask is not None:
            # padded surface rows decode to garbage; re-zero so the forward
            # conditioning keeps its padding at the origin (same contract
            # as FlowArbitrary.__call__)
            surf_cano = surf_cano * point_mask[..., None].astype(
                surf_cano.dtype
            )
        return space_cano, surf_cano

    def deform(variables, space_cano, surf_cano, surf_tgt, mask,
               point_mask=None):
        conditioning = jnp.concatenate([surf_cano, surf_tgt, mask], axis=-1)
        enc_f = _encoder_apply(
            fwd, variables, "model_deform", conditioning, interpret,
            compute_dtype, point_mask,
        )
        return decode_fast(
            variables["params"]["model_deform"]["decoder"], space_cano,
            enc_f, nneigh=nneigh, interpret=interpret,
            compute_dtype=compute_dtype,
        )

    return {"canonicalize": canonicalize, "deform": deform}


def make_fast_predict(
    model, variables, model_type: str, nneigh: int = 7,
    interpret: bool = False, compute_dtype=None,
    mesh: Optional[Any] = None,
    with_mask: bool = False,
):
    """Build the jitted fused predict function.

    Args:
      model: the flax model from ``build_model`` (DeformationNetwork or
        FlowArbitrary).
      variables: {'params', 'batch_stats'} for it.
      model_type: 'forward' | 'backward' | 'arbitrary'.
      nneigh: decoder anchor neighbourhood (config ``decoder_kwargs.nneigh``).
      mesh: optional ('data','query') device mesh; when given, the batch
        axis is sharded over 'data' and the query axis over 'query'.
      with_mask: the returned callable takes a third ``point_mask`` (B, N)
        argument marking real conditioning rows (static-shape partial
        point clouds, same contract as the flax ``point_mask``).
    """
    if model_type in ("forward", "backward"):
        no_corr = model_type == "backward"
        # backward conditioning: xyz, or xyz + source normals (10ch inputs;
        # channel contract in models/deformation.py)
        cond_end = 6 if getattr(model, "use_normals", False) else 3

        def predict_impl(variables, points, surface_samples_inputs,
                         point_mask=None):
            cond = (
                surface_samples_inputs[:, :, 0:cond_end]
                if no_corr
                else surface_samples_inputs
            )
            encoding = _encode(
                model.encoder,
                variables["params"]["encoder"],
                variables["batch_stats"]["encoder"],
                cond,
                interpret,
                compute_dtype,
                point_mask,
            )
            return decode_fast(
                variables["params"]["decoder"], points, encoding,
                nneigh=nneigh, interpret=interpret,
                compute_dtype=compute_dtype,
            )

    elif model_type == "arbitrary":
        halves = make_fast_arbitrary_halves(
            model, nneigh=nneigh, interpret=interpret,
            compute_dtype=compute_dtype,
        )

        def predict_impl(variables, points, surface_samples_inputs,
                         point_mask=None):
            surf_src = surface_samples_inputs[:, :, 0:3]
            surf_tgt = surface_samples_inputs[:, :, 3:6]
            mask = surface_samples_inputs[:, :, 6:7]
            space_cano, surf_cano = halves["canonicalize"](
                variables, points, surf_src, point_mask
            )
            return halves["deform"](
                variables, space_cano, surf_cano, surf_tgt, mask, point_mask
            )

    else:
        raise ValueError(model_type)

    if mesh is None:
        # point_mask defaults to None, so the same jitted callable serves
        # both the 2-arg and 3-arg (masked) conventions
        return jax.jit(partial(predict_impl, variables))

    # shard_map: batch over 'data', queries over 'query', weights replicated.
    # The conditioning cloud is replicated along 'query' (every query shard
    # needs the full encoding of its batch element); the per-device encoder
    # pass is redundant across the query axis but tiny next to the decode
    # at serving Q (the decode is the linear-in-Q cost being sharded).
    from nsdp_tpu.parallel.mesh import shard_map

    in_specs = (P(), P("data", "query"), P("data"))
    if with_mask:
        in_specs = in_specs + (P("data"),)
    mapped = shard_map(
        predict_impl,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P("data", "query"),
    )
    return jax.jit(partial(mapped, variables))
