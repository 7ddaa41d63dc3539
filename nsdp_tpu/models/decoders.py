"""Neural-field decoders: query 3D points against the shape encoding.

TPU re-designs of the reference decoders
(``model/decoder/crosstransformer_decoder.py:6-70`` and
``model/decoder/interpolation_decoder.py:8-88``).  The query-point axis is
embarrassingly parallel — it is the axis the parallel layer shards across
devices for field evaluation (see ``nsdp_tpu.parallel``).

Both decoders output the deformed *absolute* position (not a displacement):
the training loss compares the output directly to target positions
(reference ``model/deformation_networks.py:71``).
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as fnn

from nsdp_tpu.nn.blocks import CrossTransformerBlock, ResnetBlockFC
from nsdp_tpu.ops.knn import square_distance


class CrossTransformerDecoder(fnn.Module):
    """Cross-attention decoder (default).

    Per query point: one CrossTransformerBlock over the ``nneigh`` nearest
    anchors + the global latent token, then a 5-block conditioned ResNet-FC
    stack, then a linear head.
    """

    dim_inp: int
    dim: int
    nneigh: int = 7
    hidden_dim: int = 64
    n_blocks: int = 5
    out_dim: int = 1
    dtype: Optional[jnp.dtype] = None
    fused: bool = False  # differentiable Pallas cross attention

    @fnn.compact
    def __call__(self, xyz_q, encoding, train: bool = False):
        lat_rep = CrossTransformerBlock(
            self.dim_inp,
            self.dim,
            nneigh=self.nneigh,
            dtype=self.dtype,
            fused=self.fused,
            name="ct1",
        )(xyz_q, encoding["z"], encoding["anchors"], encoding["anchor_feats"])

        net = fnn.Dense(self.hidden_dim, dtype=self.dtype, name="init_enc")(
            lat_rep
        )
        for i in range(self.n_blocks):
            net = net + fnn.Dense(
                self.hidden_dim, dtype=self.dtype, name=f"fc_c_{i}"
            )(lat_rep)
            net = ResnetBlockFC(
                self.hidden_dim, dtype=self.dtype, name=f"blocks_{i}"
            )(net)

        return fnn.Dense(self.out_dim, dtype=self.dtype, name="fc_out")(
            fnn.relu(net)
        )


class PointInterpDecoder(fnn.Module):
    """Gaussian-kernel interpolation decoder (ablation).

    Anchor features are kernel-regressed at the query positions
    (var = 0.2^2, reference ``interpolation_decoder.py:47-65``), then fed
    through the same conditioned ResNet-FC stack.
    """

    dim_inp: int
    dim: int
    out_dim: int = 3
    hidden_dim: int = 50
    n_blocks: int = 5
    var: float = 0.2**2
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, xyz_q, encoding, train: bool = False):
        xyz = encoding["anchors"]
        feats = encoding["anchor_feats"]

        # Gaussian kernel regression of anchor features at the queries.
        # (The reference adds 1e-5 to the *norm* before squaring; reproduced.)
        dist = jnp.sqrt(
            jnp.maximum(square_distance(xyz_q, xyz), 1e-12)
        )  # (B, nQ, A)
        logits = -((dist + 1e-5) ** 2) / self.var
        weight = jnp.exp(logits)
        weight = weight / jnp.sum(weight, axis=2, keepdims=True)
        interp = jnp.einsum("bqa,bad->bqd", weight, feats)

        lat_rep = fnn.Dense(self.dim, dtype=self.dtype, name="fc0")(interp)
        net = fnn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(
            fnn.relu(lat_rep)
        )
        for i in range(self.n_blocks):
            net = net + fnn.Dense(
                self.hidden_dim, dtype=self.dtype, name=f"fc_c_{i}"
            )(lat_rep)
            net = ResnetBlockFC(
                self.hidden_dim, dtype=self.dtype, name=f"blocks_{i}"
            )(net)

        return fnn.Dense(self.out_dim, dtype=self.dtype, name="fc_out")(
            fnn.relu(net)
        )


decoder_dict = {
    "crossatten": CrossTransformerDecoder,
    "interp": PointInterpDecoder,
}
