"""Point-cloud encoders producing a global latent + local anchor latents.

TPU re-designs of the reference encoders
(``model/encoder/pointransformer.py:6-140`` and
``model/encoder/pointnetplusplus.py:5-96``).  Both return
``{'z': (B, D), 'anchors': (B, A, 3), 'anchor_feats': (B, A, D)}``.
"""

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as fnn

from nsdp_tpu.nn.blocks import (
    ElementwiseMLP,
    TransformerBlock,
    TransitionDown,
    TwoLayerMLP,
)


class PointTransformerEncoder(fnn.Module):
    """Hierarchical Point Transformer encoder.

    Pipeline (defaults ``npoints_per_layer=[5000, 500, 100]``, ``k=16``,
    ``k_reduced=10``, ``d=256``, ``d_reduced=120``, 3 final blocks):

    1. optional feature lift of the non-xyz channels (``enc_sdf``);
    2. a first local TransformerBlock at full resolution in ``d_reduced``;
    3. per level: attentive set abstraction (FPS + cross-attention) ->
       ElementwiseMLP -> local TransformerBlock, with a ``d_reduced ->
       d_transformer`` projection after level 0;
    4. ``nfinal_transformers`` full self-attention blocks over the anchors;
    5. max-pool over anchors -> 2-layer MLP for the global latent.
    """

    npoints_per_layer: Sequence[int]
    nneighbor: int
    nneighbor_reduced: int
    nfinal_transformers: int
    d_transformer: int
    d_reduced: int
    full_SA: bool = False
    has_features: bool = False
    inp_feat_dim: int = 1
    dtype: Optional[jnp.dtype] = None
    fused: bool = False  # differentiable Pallas attention for kNN blocks

    @fnn.compact
    def __call__(self, xyz, train: bool = False, point_mask=None):
        # ``point_mask`` (B, N) nonzero = real point: static-shape partial
        # point clouds (padded rows sit at the origin, where FPS never
        # selects them; the mask removes them from kNN neighbourhoods and
        # from the full-resolution BatchNorm statistics).  After the first
        # TransitionDown every surviving point is real, so the mask only
        # touches the full-resolution stages.
        #
        # Debug hook (reference ``pointransformer.py:96-135``
        # intermediate_out_path): per-level anchor clouds are sown into the
        # 'intermediates' collection; apply with
        # ``mutable=['intermediates']`` (or use
        # :func:`dump_encoder_intermediates`) to retrieve them — IO stays
        # outside jit, the TPU program is unchanged when not requested.
        self.sow("intermediates", "Input", xyz[:, :, :3])
        if self.has_features:
            feats_in = fnn.Dense(
                self.d_reduced, dtype=self.dtype, name="enc_sdf"
            )(xyz[:, :, 3:])
            xyz = xyz[:, :, :3]
            feats = TransformerBlock(
                self.d_reduced,
                self.nneighbor_reduced,
                pos_only=False,
                dtype=self.dtype,
                fused=self.fused,
                name="transformer_begin",
            )(xyz, feats_in, train, point_mask)
        else:
            feats = TransformerBlock(
                self.d_reduced,
                self.nneighbor_reduced,
                pos_only=True,
                dtype=self.dtype,
                fused=self.fused,
                name="transformer_begin",
            )(xyz, None, train, point_mask)

        n_levels = len(self.npoints_per_layer) - 1
        for i in range(n_levels):
            old_n = self.npoints_per_layer[i]
            new_n = self.npoints_per_layer[i + 1]
            dim = self.d_reduced if i == 0 else self.d_transformer

            xyz, feats = TransitionDown(
                new_n,
                min(self.nneighbor, old_n),
                dim,
                sa_type="attentive",
                dtype=self.dtype,
                fused=self.fused,
                name=f"transition_downs_{i}",
            )(xyz, feats, train, point_mask if i == 0 else None)
            self.sow("intermediates", f"SetAbs{i}", xyz)
            feats = ElementwiseMLP(
                dim, dtype=self.dtype, name=f"elementwise_extras_{i}"
            )(feats, train)
            feats = TransformerBlock(
                dim,
                min(self.nneighbor, new_n),
                dtype=self.dtype,
                fused=self.fused,
                name=f"transformer_downs_{i}",
            )(xyz, feats, train)
            self.sow("intermediates", f"PTB{i}", xyz)
            if i == 0 and self.d_reduced != self.d_transformer:
                feats = fnn.Dense(
                    self.d_transformer, dtype=self.dtype, name="fc1"
                )(feats)
            feats = ElementwiseMLP(
                self.d_transformer, dtype=self.dtype, name=f"elementwise_{i}"
            )(feats, train)

        for i in range(self.nfinal_transformers):
            feats = TransformerBlock(
                self.d_transformer,
                2 * self.nneighbor,
                group_all=self.full_SA,
                dtype=self.dtype,
                fused=self.fused,
                name=f"final_transformers_{i}",
            )(xyz, feats, train)
            feats = ElementwiseMLP(
                self.d_transformer, dtype=self.dtype, name=f"final_elementwise_{i}"
            )(feats, train)
            self.sow("intermediates", f"fullPTB{i}", xyz)

        lat_vec = jnp.max(feats, axis=1)
        z = TwoLayerMLP(self.d_transformer, dtype=self.dtype, name="fc_middle")(
            lat_vec
        )
        return {"z": z, "anchors": xyz, "anchor_feats": feats}


def dump_encoder_intermediates(encoder, variables, xyz, out_path):
    """Write the encoder's per-level point clouds to ``out_path``.

    The reference's ``intermediate_out_path`` debug hook
    (``model/encoder/pointransformer.py:96-135``): one npz with the first
    batch element's input cloud and each level's anchor positions.  Here the
    clouds are collected through flax's 'intermediates' collection in a
    single traced apply, then written host-side.
    """
    import os

    import numpy as np

    _, state = encoder.apply(
        variables, xyz, False, mutable=["intermediates"]
    )
    inter = state["intermediates"]
    out = {k: np.asarray(v[0])[0] for k, v in inter.items()}
    os.makedirs(out_path, exist_ok=True)
    path = os.path.join(out_path, "intermediate_pcs.npz")
    np.savez(path, **out)
    return path


class PointNetPlusPlusEncoder(fnn.Module):
    """PointNet++-style ablation encoder: maxpool set abstraction + final
    full self-attention blocks (reference ``pointnetplusplus.py:5-96``)."""

    npoints_per_layer: Sequence[int]
    nneighbor: int
    d_transformer: int
    nfinal_transformers: int
    has_features: bool = False
    inp_feat_dim: int = 1
    dtype: Optional[jnp.dtype] = None

    @fnn.compact
    def __call__(self, xyz, train: bool = False, point_mask=None):
        if self.has_features:
            feats = TwoLayerMLP(
                self.d_transformer, dtype=self.dtype, name="fc_begin"
            )(xyz[:, :, 3:])
            xyz = xyz[:, :, :3]
        else:
            feats = TwoLayerMLP(
                self.d_transformer, dtype=self.dtype, name="fc_begin"
            )(xyz)

        for i in range(len(self.npoints_per_layer) - 1):
            old_n = self.npoints_per_layer[i]
            new_n = self.npoints_per_layer[i + 1]
            xyz, feats = TransitionDown(
                new_n,
                min(self.nneighbor, old_n),
                self.d_transformer,
                sa_type="maxpool",
                dtype=self.dtype,
                name=f"transition_downs_{i}",
            )(xyz, feats, train, point_mask if i == 0 else None)
            feats = ElementwiseMLP(
                self.d_transformer, dtype=self.dtype, name=f"elementwise_{i}"
            )(feats, train)

        for i in range(self.nfinal_transformers):
            feats = TransformerBlock(
                self.d_transformer,
                -1,
                group_all=True,
                dtype=self.dtype,
                name=f"final_transformers_{i}",
            )(xyz, feats, train)
            feats = ElementwiseMLP(
                self.d_transformer, dtype=self.dtype, name=f"final_elementwise_{i}"
            )(feats, train)

        lat_vec = jnp.max(feats, axis=1)
        z = TwoLayerMLP(self.d_transformer, dtype=self.dtype, name="fc_middle")(
            lat_vec
        )
        return {"z": z, "anchors": xyz, "anchor_feats": feats}


encoder_dict = {
    "pointransformer": PointTransformerEncoder,
    "pointnet++": PointNetPlusPlusEncoder,
}
