"""DeformationService: bucketed numpy-in/numpy-out inference."""

import numpy as np

from nsdp_tpu.serving import DeformationService
from tests.test_fast_predict import CFG


def test_service_deform_shapes(rng):
    cfg = {
        "model": dict(CFG["model"]),
        "training": {"optimizer": "Adam", "lr": 1e-3},
    }
    service = DeformationService(cfg, buckets=(64, 256))
    pts = rng.randn(50, 3).astype(np.float32)
    surf = rng.randn(32, 3).astype(np.float32)
    mask = np.ones((32, 1), np.float32)
    inputs = np.concatenate([surf, surf * mask, mask], -1)

    out = service.deform(pts, inputs)
    assert out.shape == (50, 3)
    assert np.isfinite(out).all()

    # batched + above-bucket query counts
    out_b = service.deform(pts[None].repeat(2, 0), inputs[None].repeat(2, 0))
    assert out_b.shape == (2, 50, 3)
    big = rng.randn(300, 3).astype(np.float32)
    out_big = service.deform(big, inputs)
    assert out_big.shape == (300, 3)


def test_service_padding_exact(rng):
    cfg = {
        "model": dict(CFG["model"]),
        "training": {"optimizer": "Adam", "lr": 1e-3},
    }
    service = DeformationService(cfg, buckets=(64,))
    surf = rng.randn(32, 3).astype(np.float32)
    inputs = np.concatenate([surf, surf, np.ones((32, 1), np.float32)], -1)
    pts = rng.randn(40, 3).astype(np.float32)
    a = service.deform(pts, inputs)
    b = service.deform(pts[:20], inputs)
    np.testing.assert_allclose(a[:20], b, rtol=1e-5, atol=1e-6)


def test_service_mesh_sharded_matches_single(rng):
    """Mesh-sharded serving (fused path shard_map-ped over ('data','query'))
    equals single-device serving."""
    from nsdp_tpu.parallel import make_mesh

    cfg = {
        "model": dict(CFG["model"]),
        "training": {"optimizer": "Adam", "lr": 1e-3},
    }
    single = DeformationService(
        cfg, buckets=(64,), use_fused=True, interpret=True
    )
    mesh = make_mesh(data=1, query=8)
    sharded = DeformationService(
        cfg, buckets=(64,), use_fused=True, interpret=True, mesh=mesh
    )
    surf = rng.randn(32, 3).astype(np.float32)
    inputs = np.concatenate([surf, surf, np.ones((32, 1), np.float32)], -1)
    pts = rng.randn(50, 3).astype(np.float32)
    out_1 = single.deform(pts, inputs)
    out_m = sharded.deform(pts, inputs)
    assert out_m.shape == (50, 3)
    np.testing.assert_allclose(out_m, out_1, rtol=1e-4, atol=1e-4)

    # flax path cannot shard: clear error
    import pytest

    with pytest.raises(ValueError, match="fused"):
        DeformationService(cfg, use_fused=False, mesh=mesh)
