"""Unit tests for nsdp_tpu.ops against closed-form / brute-force references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nsdp_tpu.ops import (
    furthest_point_sample,
    knn,
    square_distance,
    index_points,
    gather_operation,
    grouping_operation,
    ball_query,
    three_nn,
    three_interpolate,
)
from nsdp_tpu.ops.geometry import interpolation_weights


def brute_fps(xyz, npoint):
    """Reference FPS with CUDA-kernel semantics (start 0, origin skip)."""
    N = xyz.shape[0]
    mag = (xyz**2).sum(-1)
    valid = mag > 1e-3
    min_dist = np.full(N, 1e10)
    idxs = [0]
    last = 0
    for _ in range(1, npoint):
        d = ((xyz - xyz[last]) ** 2).sum(-1)
        min_dist = np.where(valid, np.minimum(min_dist, d), min_dist)
        cand = np.where(valid, min_dist, -np.inf)
        last = int(np.argmax(cand))
        idxs.append(last)
    return np.array(idxs)


class TestFPS:
    def test_starts_at_zero(self, rng):
        xyz = rng.randn(2, 64, 3).astype(np.float32) + 1.0
        idx = np.asarray(furthest_point_sample(jnp.asarray(xyz), 8))
        assert (idx[:, 0] == 0).all()

    def test_matches_bruteforce(self, rng):
        xyz = rng.randn(3, 100, 3).astype(np.float32) + 0.5
        idx = np.asarray(furthest_point_sample(jnp.asarray(xyz), 16))
        for b in range(3):
            np.testing.assert_array_equal(idx[b], brute_fps(xyz[b], 16))

    def test_known_configuration(self):
        # Cube corners + centre cluster: FPS must pick spread-out corners.
        pts = np.array(
            [
                [1, 1, 1],
                [0.4, 0.41, 0.4],
                [-1, -1, -1],
                [0.41, 0.4, 0.4],
                [1, -1, 1],
                [-1, 1, -1],
            ],
            dtype=np.float32,
        )[None]
        idx = np.asarray(furthest_point_sample(jnp.asarray(pts), 4))[0]
        assert idx[0] == 0
        assert idx[1] == 2  # opposite corner is furthest from [1,1,1]
        assert set(idx).issubset({0, 2, 4, 5})  # corners, never the cluster

    def test_origin_skip(self):
        # Points with |p|^2 <= 1e-3 are never selected (padding convention),
        # even though they'd be far from the selected set.
        pts = np.array(
            [[1, 1, 1], [0.01, 0, 0], [0, 0, 0], [1.2, 1, 1]], dtype=np.float32
        )[None]
        idx = np.asarray(furthest_point_sample(jnp.asarray(pts), 3))[0]
        assert 1 not in idx[1:] and 2 not in idx[1:]

    def test_selected_points_distinct(self, rng):
        xyz = rng.randn(1, 200, 3).astype(np.float32) + 2.0
        idx = np.asarray(furthest_point_sample(jnp.asarray(xyz), 50))[0]
        assert len(set(idx.tolist())) == 50

    def test_pallas_kernel_matches_xla(self, rng):
        from nsdp_tpu.ops.fps_pallas import furthest_point_sample_pallas

        for B, N, npoint in [(2, 100, 16), (1, 700, 64), (3, 333, 50)]:
            xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) + 0.5)
            ref = np.asarray(furthest_point_sample(xyz, npoint))
            got = np.asarray(
                furthest_point_sample_pallas(xyz, npoint, interpret=True)
            )
            np.testing.assert_array_equal(ref, got)


class TestKNN:
    def test_matches_argsort(self, rng):
        q = rng.randn(2, 37, 3).astype(np.float32)
        p = rng.randn(2, 53, 3).astype(np.float32)
        idx = np.asarray(knn(jnp.asarray(q), jnp.asarray(p), 5, chunk_size=16))
        d2 = ((q[:, :, None] - p[:, None]) ** 2).sum(-1)
        ref = np.argsort(d2, axis=-1, kind="stable")[:, :, :5]
        # compare distances (tie order may differ)
        got_d = np.take_along_axis(d2, idx, axis=-1)
        ref_d = np.take_along_axis(d2, ref, axis=-1)
        np.testing.assert_allclose(got_d, ref_d, rtol=1e-4, atol=1e-5)

    def test_includes_self_first(self, rng):
        p = rng.randn(1, 40, 3).astype(np.float32)
        idx = np.asarray(knn(jnp.asarray(p), jnp.asarray(p), 4))
        np.testing.assert_array_equal(idx[0, :, 0], np.arange(40))

    def test_return_dist_sorted(self, rng):
        q = rng.randn(1, 10, 3).astype(np.float32)
        p = rng.randn(1, 30, 3).astype(np.float32)
        _, d = knn(jnp.asarray(q), jnp.asarray(p), 6, return_dist=True)
        d = np.asarray(d)
        assert (np.diff(d, axis=-1) >= -1e-6).all()
        assert (d >= 0).all()

    def test_chunk_padding(self, rng):
        # Nq not a multiple of chunk_size exercises the pad/slice path.
        q = rng.randn(2, 100, 3).astype(np.float32)
        p = rng.randn(2, 64, 3).astype(np.float32)
        a = np.asarray(knn(jnp.asarray(q), jnp.asarray(p), 3, chunk_size=32))
        b = np.asarray(knn(jnp.asarray(q), jnp.asarray(p), 3, chunk_size=100))
        np.testing.assert_array_equal(a, b)

    def test_square_distance(self, rng):
        a = rng.randn(2, 5, 3).astype(np.float32)
        b = rng.randn(2, 7, 3).astype(np.float32)
        got = np.asarray(square_distance(jnp.asarray(a), jnp.asarray(b)))
        ref = ((a[:, :, None] - b[:, None]) ** 2).sum(-1)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


class TestGather:
    def test_index_points_2d(self, rng):
        pts = rng.randn(2, 10, 4).astype(np.float32)
        idx = rng.randint(0, 10, size=(2, 6))
        got = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
        for b in range(2):
            np.testing.assert_array_equal(got[b], pts[b][idx[b]])

    def test_index_points_3d(self, rng):
        pts = rng.randn(2, 10, 4).astype(np.float32)
        idx = rng.randint(0, 10, size=(2, 6, 3))
        got = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
        assert got.shape == (2, 6, 3, 4)
        for b in range(2):
            np.testing.assert_array_equal(got[b], pts[b][idx[b]])

    def test_gather_operation(self, rng):
        feats = rng.randn(2, 8, 12).astype(np.float32)
        idx = rng.randint(0, 12, size=(2, 5))
        got = np.asarray(
            gather_operation(jnp.asarray(feats), jnp.asarray(idx))
        )
        for b in range(2):
            np.testing.assert_array_equal(got[b], feats[b][:, idx[b]])

    def test_grouping_operation(self, rng):
        feats = rng.randn(2, 8, 12).astype(np.float32)
        idx = rng.randint(0, 12, size=(2, 5, 3))
        got = np.asarray(
            grouping_operation(jnp.asarray(feats), jnp.asarray(idx))
        )
        assert got.shape == (2, 8, 5, 3)
        for b in range(2):
            for c in range(8):
                np.testing.assert_array_equal(got[b, c], feats[b, c][idx[b]])

    def test_index_points_grad_flows(self):
        pts = jnp.ones((1, 5, 2))
        idx = jnp.array([[0, 0, 3]])

        def f(p):
            return jnp.sum(index_points(p, idx))

        g = jax.grad(f)(pts)
        # index 0 gathered twice -> grad 2; index 3 once -> 1.
        np.testing.assert_allclose(np.asarray(g[0, :, 0]), [2, 0, 0, 1, 0])


class TestBallQuery:
    def test_first_hit_padding(self):
        xyz = np.array([[[0, 0, 0], [5, 5, 5], [0.1, 0, 0], [0.2, 0, 0]]], np.float32)
        centre = np.array([[[0, 0, 0]]], np.float32)
        idx = np.asarray(ball_query(0.5, 6, jnp.asarray(xyz), jnp.asarray(centre)))
        # hits in index order: 0, 2, 3; padded with first hit 0.
        np.testing.assert_array_equal(idx[0, 0], [0, 2, 3, 0, 0, 0])

    def test_no_hits_zero(self):
        xyz = np.array([[[5, 5, 5], [6, 6, 6]]], np.float32)
        centre = np.array([[[0, 0, 0]]], np.float32)
        idx = np.asarray(ball_query(0.5, 3, jnp.asarray(xyz), jnp.asarray(centre)))
        np.testing.assert_array_equal(idx[0, 0], [0, 0, 0])


class TestThreeNN:
    def test_matches_bruteforce(self, rng):
        unk = rng.randn(2, 9, 3).astype(np.float32)
        kno = rng.randn(2, 15, 3).astype(np.float32)
        dist, idx = three_nn(jnp.asarray(unk), jnp.asarray(kno))
        d2 = ((unk[:, :, None] - kno[:, None]) ** 2).sum(-1)
        ref_idx = np.argsort(d2, axis=-1)[:, :, :3]
        ref_d = np.sqrt(np.take_along_axis(d2, ref_idx, -1))
        np.testing.assert_allclose(np.asarray(dist), ref_d, rtol=1e-4, atol=1e-5)

    def test_interpolate(self, rng):
        feats = rng.randn(1, 4, 6).astype(np.float32)
        idx = rng.randint(0, 6, size=(1, 5, 3))
        w = rng.rand(1, 5, 3).astype(np.float32)
        w /= w.sum(-1, keepdims=True)
        got = np.asarray(
            three_interpolate(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w))
        )
        ref = np.einsum("bcnk->bcn", feats[0][None][:, :, idx[0]] * w[0][None, None])
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_weights_sum_to_one(self, rng):
        d = np.abs(rng.rand(1, 7, 3)).astype(np.float32)
        w = np.asarray(interpolation_weights(jnp.asarray(d)))
        np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)


class TestKNNPallas:
    def test_matches_xla(self, rng):
        from nsdp_tpu.ops.knn import knn_xla
        from nsdp_tpu.ops.knn_pallas import knn_pallas

        for B, Nq, M, k in [(2, 300, 257, 7), (1, 129, 64, 10)]:
            q = jnp.asarray(rng.randn(B, Nq, 3).astype(np.float32))
            p = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
            ref = np.asarray(knn_xla(q, p, k))
            got = np.asarray(knn_pallas(q, p, k, tile=128, interpret=True))
            np.testing.assert_array_equal(ref, got)

    def test_return_dist(self, rng):
        from nsdp_tpu.ops.knn import knn_xla
        from nsdp_tpu.ops.knn_pallas import knn_pallas

        q = jnp.asarray(rng.randn(1, 100, 3).astype(np.float32))
        p = jnp.asarray(rng.randn(1, 200, 3).astype(np.float32))
        _, ref_d = knn_xla(q, p, 5, return_dist=True)
        _, got_d = knn_pallas(q, p, 5, tile=128, return_dist=True,
                              interpret=True)
        np.testing.assert_allclose(
            np.asarray(got_d), np.asarray(ref_d), rtol=1e-4, atol=1e-5
        )


def test_fibonacci_sphere():
    from nsdp_tpu.ops.geometry import fibonacci_sphere

    pts = np.asarray(fibonacci_sphere(100))
    np.testing.assert_allclose(
        np.linalg.norm(pts, axis=1), 1.0, atol=1e-6
    )
    # roughly uniform: mean close to origin
    assert np.abs(pts.mean(0)).max() < 0.1


def test_clip_grad_option():
    import optax
    from nsdp_tpu.training.optim import optimizer_factory

    _, tx = optimizer_factory({"optimizer": "SGD", "momentum": 0.0,
                               "clip_grad": 0.5})
    grads = {"w": jnp.asarray([2.0, -3.0, 0.1])}
    state = tx.init(grads)
    updates, _ = tx.update(grads, state, grads)
    np.testing.assert_allclose(
        np.asarray(updates["w"]), [0.5, -0.5, 0.1], rtol=1e-6
    )
