"""Model builders.

``build_model(config)`` dispatches on ``config['model']['type']`` exactly like
the reference (``model/__init__.py:43-118``):

* ``forward``   -> DeformationNetwork(no_input_corr=False)
* ``backward``  -> DeformationNetwork(no_input_corr=True)
* ``arbitrary`` -> FlowArbitrary(backward_net, forward_net)

Returns the (unbound) flax module; parameter initialisation / checkpoint
loading lives in :mod:`nsdp_tpu.training`.
"""

from typing import Any, Dict, Optional

import jax.numpy as jnp

from nsdp_tpu.models.decoders import (
    CrossTransformerDecoder,
    PointInterpDecoder,
    decoder_dict,
)
from nsdp_tpu.models.deformation import (
    DeformationNetwork,
    FlowArbitrary,
    compute_l2_error,
)
from nsdp_tpu.models.encoders import (
    PointNetPlusPlusEncoder,
    PointTransformerEncoder,
    encoder_dict,
)

__all__ = [
    "build_model",
    "build_deformation_network",
    "DeformationNetwork",
    "FlowArbitrary",
    "PointTransformerEncoder",
    "PointNetPlusPlusEncoder",
    "CrossTransformerDecoder",
    "PointInterpDecoder",
    "compute_l2_error",
    "encoder_dict",
    "decoder_dict",
]


def _feature_dims(model_cfg: Dict[str, Any], no_input_corr: bool):
    """Encoder feature configuration (reference ``deformation_networks.py:16-30``)."""
    use_normals = model_cfg.get("use_normals", False)
    if no_input_corr:
        if use_normals:
            return True, 3
        return False, 0
    if use_normals:
        return True, 7
    return True, 4


def build_deformation_network(
    config: Dict[str, Any],
    no_input_corr: bool = False,
    dtype: Optional[jnp.dtype] = None,
) -> DeformationNetwork:
    """Construct a single encoder+decoder deformation network from a config.

    ``config['model']['remat']: true`` wraps encoder and decoder in
    ``nn.remat`` (activations recomputed in the backward pass — trades one
    extra forward for dropping the multi-GB neighbourhood tensors from the
    stored residuals; useful for large batch x point counts).
    """
    import flax.linen as fnn

    model_cfg = config["model"]
    has_features, inp_feat_dim = _feature_dims(model_cfg, no_input_corr)
    remat = model_cfg.get("remat", False)

    encoder_cls = encoder_dict[model_cfg["encoder"]]
    decoder_cls = decoder_dict[model_cfg["decoder"]]
    if remat:
        # static_argnums counts self at 0; arg 2 is the `train` bool.
        encoder_cls = fnn.remat(encoder_cls, static_argnums=(2,))
        decoder_cls = fnn.remat(decoder_cls, static_argnums=(3,))

    fused = model_cfg.get("fused_attention", False)
    enc_extra = {}
    if fused and encoder_cls is encoder_dict["pointransformer"]:
        enc_extra["fused"] = True
    encoder = encoder_cls(
        has_features=has_features,
        inp_feat_dim=inp_feat_dim,
        dtype=dtype,
        **enc_extra,
        **model_cfg["encoder_kwargs"],
    )
    dec_extra = {}
    if fused and decoder_cls is decoder_dict["crossatten"]:
        dec_extra["fused"] = True
    decoder = decoder_cls(dtype=dtype, **dec_extra, **model_cfg["decoder_kwargs"])

    return DeformationNetwork(
        encoder=encoder,
        decoder=decoder,
        no_input_corr=no_input_corr,
        use_normals=model_cfg.get("use_normals", False),
    )


_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, None: None}


def build_model(config: Dict[str, Any], dtype: Optional[jnp.dtype] = None):
    """Build the flax module for ``config['model']['type']``.

    ``config['model']['compute_dtype']`` ('float32' | 'bfloat16') selects the
    activation/matmul dtype when ``dtype`` is not passed explicitly;
    parameters and BatchNorm statistics stay float32 either way.
    """
    if dtype is None:
        key = config["model"].get("compute_dtype")
        dtype = _DTYPES[key] if key in _DTYPES else jnp.dtype(key)
    model_type = config["model"]["type"]
    if model_type == "forward":
        return build_deformation_network(config, no_input_corr=False, dtype=dtype)
    if model_type == "backward":
        return build_deformation_network(config, no_input_corr=True, dtype=dtype)
    if model_type == "arbitrary":
        if config["model"].get("use_normals", False):
            raise ValueError(
                "use_normals is not supported for the 'arbitrary' "
                "composition: the canonicalised surface produced "
                "mid-composition has no normals to condition the forward "
                "net on (the reference declares the flag but has no "
                "working normals path, see models/deformation.py)."
            )
        return FlowArbitrary(
            model_canonicalize=build_deformation_network(
                config, no_input_corr=True, dtype=dtype
            ),
            model_deform=build_deformation_network(
                config, no_input_corr=False, dtype=dtype
            ),
        )
    raise NotImplementedError(f"unknown model type {model_type!r}")
