"""pointnet2 API-compat layer: shapes and grouping semantics."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from nsdp_tpu.ops.pointnet2_compat import (
    PointnetFPModule,
    PointnetSAModule,
    PointnetSAModuleMSG,
    group_all,
    query_and_group,
)


def test_query_and_group_shapes(rng):
    xyz = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
    new_xyz = xyz[:, :16]
    feats = jnp.asarray(rng.randn(2, 8, 64), jnp.float32)
    out = query_and_group(0.5, 9, xyz, new_xyz, feats, use_xyz=True)
    assert out.shape == (2, 8 + 3, 16, 9)
    out2 = query_and_group(0.5, 9, xyz, new_xyz, feats, use_xyz=False)
    assert out2.shape == (2, 8, 16, 9)


@pytest.mark.slow
def test_query_and_group_relative_coords(rng):
    xyz = jnp.asarray(rng.randn(1, 32, 3), jnp.float32)
    new_xyz = xyz[:, :4]
    out = np.asarray(query_and_group(10.0, 5, xyz, new_xyz))
    # hits come in index order (first-hit semantics): with radius covering
    # everything, slot 0 of every centre is point 0, expressed relative.
    expected = np.asarray(xyz)[0, 0][None, :] - np.asarray(new_xyz)[0]
    np.testing.assert_allclose(out[0, :, :, 0].T, expected, atol=1e-5)


def test_group_all_shapes(rng):
    xyz = jnp.asarray(rng.randn(2, 32, 3), jnp.float32)
    feats = jnp.asarray(rng.randn(2, 6, 32), jnp.float32)
    assert group_all(xyz, feats).shape == (2, 9, 1, 32)
    assert group_all(xyz, None).shape == (2, 3, 1, 32)


def test_sa_module(rng):
    xyz = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
    feats = jnp.asarray(rng.randn(2, 6, 64), jnp.float32)
    mod = PointnetSAModule.create(
        mlp=[6 + 3, 16, 32], npoint=16, radius=0.8, nsample=8
    )
    vars_ = mod.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    new_xyz, new_feats = mod.apply(vars_, xyz, feats, train=False)
    assert new_xyz.shape == (2, 16, 3)
    assert new_feats.shape == (2, 32, 16)


@pytest.mark.slow
def test_sa_module_msg(rng):
    xyz = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
    feats = jnp.asarray(rng.randn(2, 6, 64), jnp.float32)
    mod = PointnetSAModuleMSG(
        npoint=16, radii=[0.4, 0.8], nsamples=[4, 8],
        mlps=[[9, 16], [9, 24]],
    )
    vars_ = mod.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    new_xyz, new_feats = mod.apply(vars_, xyz, feats, train=False)
    assert new_feats.shape == (2, 16 + 24, 16)


def test_fp_module(rng):
    unknown = jnp.asarray(rng.randn(2, 64, 3), jnp.float32)
    known = jnp.asarray(rng.randn(2, 16, 3), jnp.float32)
    known_feats = jnp.asarray(rng.randn(2, 32, 16), jnp.float32)
    skip_feats = jnp.asarray(rng.randn(2, 8, 64), jnp.float32)
    mod = PointnetFPModule(mlp=[40, 24])
    vars_ = mod.init(
        jax.random.PRNGKey(0), unknown, known, skip_feats, known_feats,
        train=False,
    )
    out = mod.apply(
        vars_, unknown, known, skip_feats, known_feats, train=False
    )
    assert out.shape == (2, 24, 64)
