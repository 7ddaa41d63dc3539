"""Inference fast path: flax encoders + fused Pallas decoders.

``make_fast_predict(model, variables, model_type)`` returns a jitted
``predict(points, surface_samples_inputs)`` numerically equivalent to the
standard eval path (``training.steps`` predict) but routing every decoder
evaluation through :func:`nsdp_tpu.models.fast_decoder.decode_fast`, and
encoding each conditioning cloud exactly once.  Used by serving/benchmark;
training keeps the flax path (the fused kernel has no VJP).
"""

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

from nsdp_tpu.models.fast_decoder import decode_fast
from nsdp_tpu.models.fast_encoder import encode_fast
from nsdp_tpu.models.encoders import PointTransformerEncoder


def _encode(encoder, params, batch_stats, conditioning, interpret,
            compute_dtype=None):
    """Fused raw-param encoder when available, flax apply otherwise."""
    if isinstance(encoder, PointTransformerEncoder):
        return encode_fast(
            encoder, params, batch_stats, conditioning, interpret=interpret,
            compute_dtype=compute_dtype,
        )
    return encoder.apply(
        {"params": params, "batch_stats": batch_stats},
        conditioning,
        train=False,
    )


def _encoder_apply(net, variables, prefix, conditioning, interpret=False,
                   compute_dtype=None):
    return _encode(
        net.encoder,
        variables["params"][prefix]["encoder"],
        variables["batch_stats"][prefix]["encoder"],
        conditioning,
        interpret,
        compute_dtype,
    )


def make_fast_predict(
    model, variables, model_type: str, nneigh: int = 7,
    interpret: bool = False, compute_dtype=None,
):
    """Build the jitted fused predict function.

    Args:
      model: the flax model from ``build_model`` (DeformationNetwork or
        FlowArbitrary).
      variables: {'params', 'batch_stats'} for it.
      model_type: 'forward' | 'backward' | 'arbitrary'.
      nneigh: decoder anchor neighbourhood (config ``decoder_kwargs.nneigh``).
    """
    if model_type in ("forward", "backward"):
        no_corr = model_type == "backward"

        @jax.jit
        def predict(points, surface_samples_inputs):
            cond = (
                surface_samples_inputs[:, :, 0:3]
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
            )
            return decode_fast(
                variables["params"]["decoder"], points, encoding,
                nneigh=nneigh, interpret=interpret,
                compute_dtype=compute_dtype,
            )

        return predict

    if model_type != "arbitrary":
        raise ValueError(model_type)

    bwd = model.model_canonicalize
    fwd = model.model_deform

    @jax.jit
    def predict(points, surface_samples_inputs):
        surf_src = surface_samples_inputs[:, :, 0:3]
        surf_tgt = surface_samples_inputs[:, :, 3:6]
        mask = surface_samples_inputs[:, :, 6:7]

        enc_b = _encoder_apply(
            bwd, variables, "model_canonicalize", surf_src, interpret,
            compute_dtype,
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

        conditioning = jnp.concatenate([surf_cano, surf_tgt, mask], axis=-1)
        enc_f = _encoder_apply(
            fwd, variables, "model_deform", conditioning, interpret,
            compute_dtype,
        )
        return decode_fast(
            variables["params"]["model_deform"]["decoder"], space_cano, enc_f,
            nneigh=nneigh, interpret=interpret,
            compute_dtype=compute_dtype,
        )

    return predict
