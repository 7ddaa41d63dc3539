"""Vector-attention building blocks (flax.linen)."""

from nsdp_tpu.nn.blocks import (
    TwoLayerMLP,
    BatchNorm,
    vector_attention,
    TransformerBlock,
    ElementwiseMLP,
    TransitionDown,
    TransformerSetAbstraction,
    PointNetSetAbstraction,
    CrossTransformerBlock,
    ResnetBlockFC,
)

__all__ = [
    "TwoLayerMLP",
    "BatchNorm",
    "vector_attention",
    "TransformerBlock",
    "ElementwiseMLP",
    "TransitionDown",
    "TransformerSetAbstraction",
    "PointNetSetAbstraction",
    "CrossTransformerBlock",
    "ResnetBlockFC",
]
