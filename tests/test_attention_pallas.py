"""Generic fused vector-attention kernel vs XLA reference math."""

import numpy as np
import jax
import jax.numpy as jnp

from nsdp_tpu.ops.attention_pallas import fused_vector_attention
from nsdp_tpu.ops.knn import knn_xla
from nsdp_tpu.ops.gather import index_points


def _mlp2(x, w0, b0, w1, b1):
    return jnp.maximum(x @ w0 + b0, 0.0) @ w1 + b1


def _ref_attention(xyz_q, kv_xyz, qf, K, V, weights, k, pos_only):
    dw0, db0, dw1, db1, gw0, gb0, gw1, gb1 = weights
    idx = knn_xla(xyz_q, kv_xyz, k)
    pos = _mlp2(
        xyz_q[:, :, None, :] - index_points(kv_xyz, idx), dw0, db0, dw1, db1
    )
    if pos_only:
        logits = _mlp2(pos, gw0, gb0, gw1, gb1)
        value = pos
    else:
        logits = _mlp2(
            qf[:, :, None, :] - index_points(K, idx) + pos, gw0, gb0, gw1, gb1
        )
        value = index_points(V, idx) + pos
    attn = jax.nn.softmax(logits, axis=-2)
    return jnp.sum(attn * value, axis=-2)


def _weights(rng, d):
    return (
        jnp.asarray(rng.randn(3, d).astype(np.float32) * 0.3),
        jnp.asarray(rng.randn(d).astype(np.float32) * 0.1),
        jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.3),
        jnp.asarray(rng.randn(d).astype(np.float32) * 0.1),
        jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.3),
        jnp.asarray(rng.randn(d).astype(np.float32) * 0.1),
        jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.3),
        jnp.asarray(rng.randn(d).astype(np.float32) * 0.1),
    )


def test_self_attention_with_features(rng):
    B, N, d, k = 2, 150, 12, 6
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    qf = jnp.asarray(rng.randn(B, N, d).astype(np.float32))
    K = jnp.asarray(rng.randn(B, N, d).astype(np.float32))
    V = jnp.asarray(rng.randn(B, N, d).astype(np.float32))
    w = _weights(rng, d)
    ref = _ref_attention(xyz, xyz, qf, K, V, w, k, False)
    got = fused_vector_attention(
        xyz, xyz, qf, K, V, *w, k=k, tile=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_pos_only(rng):
    B, N, d, k = 1, 90, 10, 5
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    w = _weights(rng, d)
    ref = _ref_attention(xyz, xyz, None, None, None, w, k, True)
    got = fused_vector_attention(
        xyz, xyz, None, None, None, *w, k=k, tile=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_cross_attention_fps_centres(rng):
    # queries are a subset of the cloud, kv the full cloud (TSA pattern)
    B, M, S, d, k = 2, 200, 40, 14, 8
    kv = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
    centres = kv[:, :S]
    qf = jnp.asarray(rng.randn(B, S, d).astype(np.float32))
    K = jnp.asarray(rng.randn(B, M, d).astype(np.float32))
    V = jnp.asarray(rng.randn(B, M, d).astype(np.float32))
    w = _weights(rng, d)
    ref = _ref_attention(centres, kv, qf, K, V, w, k, False)
    got = fused_vector_attention(
        centres, kv, qf, K, V, *w, k=k, tile=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


class TestCustomVJP:
    def _grads_ref(self, args, w, k, pos_only):
        xyz, kv, qf, K, V = args

        def loss(xyz, kv, qf, K, V, *w):
            out = _ref_attention(
                xyz, kv, qf, K, V, w, k, pos_only
            )
            return jnp.sum(out * out)

        if pos_only:
            f = lambda xyz, kv, *w: loss(xyz, kv, None, None, None, *w)
            return jax.grad(f, argnums=tuple(range(2 + 8)))(xyz, kv, *w)
        return jax.grad(loss, argnums=tuple(range(5 + 8)))(xyz, kv, qf, K, V, *w)

    def _grads_fused(self, args, w, k, pos_only):
        from nsdp_tpu.ops.attention_pallas import knn_vector_attention

        xyz, kv, qf, K, V = args

        def loss(xyz, kv, qf, K, V, *w):
            out = knn_vector_attention(
                xyz, kv, qf, K, V, None, None, None, *w, k, 128, True
            )
            return jnp.sum(out * out)

        if pos_only:
            f = lambda xyz, kv, *w: loss(xyz, kv, None, None, None, *w)
            return jax.grad(f, argnums=tuple(range(2 + 8)))(xyz, kv, *w)
        return jax.grad(loss, argnums=tuple(range(5 + 8)))(xyz, kv, qf, K, V, *w)

    def test_grads_with_features(self, rng):
        B, N, d, k = 2, 96, 10, 5
        xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        qf = jnp.asarray(rng.randn(B, N, d).astype(np.float32))
        K = jnp.asarray(rng.randn(B, N, d).astype(np.float32))
        V = jnp.asarray(rng.randn(B, N, d).astype(np.float32))
        w = _weights(rng, d)
        ref = self._grads_ref((xyz, xyz, qf, K, V), w, k, False)
        got = self._grads_fused((xyz, xyz, qf, K, V), w, k, False)
        assert len(ref) == len(got)
        for i, (r, g) in enumerate(zip(ref, got)):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-3, atol=1e-4,
                err_msg=f"grad {i}",
            )

    def test_grads_pos_only(self, rng):
        B, N, d, k = 1, 80, 8, 4
        xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        w = _weights(rng, d)
        ref = self._grads_ref((xyz, xyz, None, None, None), w, k, True)
        got = self._grads_fused((xyz, xyz, None, None, None), w, k, True)
        for i, (r, g) in enumerate(zip(ref, got)):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-3, atol=1e-4,
                err_msg=f"grad {i}",
            )

    def test_grads_cross(self, rng):
        # self-attention grads accumulate both query-side and kv-side
        # contributions into the same xyz; cross pattern separates them
        B, M, S, d, k = 1, 120, 30, 8, 6
        kv = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
        centres = jnp.asarray(rng.randn(B, S, 3).astype(np.float32))
        qf = jnp.asarray(rng.randn(B, S, d).astype(np.float32))
        K = jnp.asarray(rng.randn(B, M, d).astype(np.float32))
        V = jnp.asarray(rng.randn(B, M, d).astype(np.float32))
        w = _weights(rng, d)
        ref = self._grads_ref((centres, kv, qf, K, V), w, k, False)
        got = self._grads_fused((centres, kv, qf, K, V), w, k, False)
        for i, (r, g) in enumerate(zip(ref, got)):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-3, atol=1e-4,
                err_msg=f"grad {i}",
            )


class TestGlobalToken:
    def _ref_global(self, xyz_q, kv, qf, K, V, k_g, v_g, w, k):
        dw0, db0, dw1, db1, gw0, gb0, gw1, gb1 = w
        idx = knn_xla(xyz_q, kv, k)
        pos = _mlp2(
            xyz_q[:, :, None, :] - index_points(kv, idx), dw0, db0, dw1, db1
        )
        zeros = jnp.zeros(pos.shape[:2] + (1, pos.shape[-1]))
        pos_all = jnp.concatenate([pos, zeros], axis=2)
        k_all = jnp.concatenate(
            [index_points(K, idx),
             jnp.broadcast_to(k_g[:, None, None, :], zeros.shape[:3] + (K.shape[-1],))],
            axis=2,
        )
        v_all = jnp.concatenate(
            [index_points(V, idx),
             jnp.broadcast_to(v_g[:, None, None, :], zeros.shape[:3] + (V.shape[-1],))],
            axis=2,
        )
        logits = _mlp2(
            qf[:, :, None, :] - k_all + pos_all, gw0, gb0, gw1, gb1
        )
        attn = jax.nn.softmax(logits, axis=-2)
        return jnp.sum(attn * (v_all + pos_all), axis=-2)

    def test_forward_with_global(self, rng):
        from nsdp_tpu.ops.attention_pallas import fused_vector_attention

        B, N, A, d, k = 2, 60, 20, 10, 5
        xyz_q = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        kv = jnp.asarray(rng.randn(B, A, 3).astype(np.float32))
        qf = jnp.asarray(rng.randn(B, N, d).astype(np.float32))
        K = jnp.asarray(rng.randn(B, A, d).astype(np.float32))
        V = jnp.asarray(rng.randn(B, A, d).astype(np.float32))
        k_g = jnp.asarray(rng.randn(B, d).astype(np.float32))
        v_g = jnp.asarray(rng.randn(B, d).astype(np.float32))
        w = _weights(rng, d)
        ref = self._ref_global(xyz_q, kv, qf, K, V, k_g, v_g, w, k)
        got = fused_vector_attention(
            xyz_q, kv, qf, K, V, *w, k=k, tile=128, interpret=True,
            k_glob=k_g, v_glob=v_g,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
        )

    def test_grads_with_global(self, rng):
        from nsdp_tpu.ops.attention_pallas import knn_vector_attention

        B, N, A, d, k = 1, 50, 16, 8, 4
        xyz_q = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        kv = jnp.asarray(rng.randn(B, A, 3).astype(np.float32))
        qf = jnp.asarray(rng.randn(B, N, d).astype(np.float32))
        K = jnp.asarray(rng.randn(B, A, d).astype(np.float32))
        V = jnp.asarray(rng.randn(B, A, d).astype(np.float32))
        k_g = jnp.asarray(rng.randn(B, d).astype(np.float32))
        v_g = jnp.asarray(rng.randn(B, d).astype(np.float32))
        w = _weights(rng, d)

        def loss_ref(*args):
            return jnp.sum(self._ref_global(*args[:7], args[7:], k) ** 2)

        def loss_fused(*args):
            out = knn_vector_attention(
                *args[:7], None, *args[7:], k, 128, True
            )
            return jnp.sum(out**2)

        argnums = tuple(range(7 + 8))
        ref = jax.grad(loss_ref, argnums)(xyz_q, kv, qf, K, V, k_g, v_g, *w)
        got = jax.grad(loss_fused, argnums)(xyz_q, kv, qf, K, V, k_g, v_g, *w)
        for i, (r, g) in enumerate(zip(ref, got)):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-3, atol=1e-4,
                err_msg=f"grad {i}",
            )


class TestCoordSplitTable:
    """Invariants of the hi/lo coordinate split in the packed gather table.

    On the chip the one-hot gather's DEFAULT-precision MXU pass truncates
    each operand to bf16-class; the split guarantees the position delta
    survives that truncation (attention_pallas module docstring).  The
    truncation itself cannot run under CPU interpret mode, so these tests
    pin the layout invariants plus a simulated truncating gather.
    """

    def _table(self, rng, M=64):
        from nsdp_tpu.ops.attention_pallas import _pack_xk

        coords = jnp.asarray(rng.randn(1, M, 3).astype(np.float32))
        xyz8, w = _pack_xk(coords, None, M)
        assert w == 8 and xyz8.shape == (1, M, 8)
        return np.asarray(coords[0]), np.asarray(xyz8[0])

    def test_hi_bf16_exact_and_split_exact(self, rng):
        coords, tab = self._table(rng)
        hi, lo = tab[:, 0:3], tab[:, 3:6]
        # hi is exactly bf16-representable -> the truncating MXU pass
        # gathers it without error
        np.testing.assert_array_equal(
            hi, hi.astype(jnp.bfloat16.dtype).astype(np.float32)
        )
        # the split is exact in f32 (Dekker): hi + lo == coords bitwise
        np.testing.assert_array_equal(hi + lo, coords)
        np.testing.assert_array_equal(tab[:, 6:8], 0.0)

    def test_split_survives_bf16_truncating_gather(self, rng):
        coords, tab = self._table(rng)
        trunc = tab.astype(jnp.bfloat16.dtype).astype(np.float32)
        recon = trunc[:, 0:3] + trunc[:, 3:6]
        plain = coords.astype(jnp.bfloat16.dtype).astype(np.float32)
        err_split = np.abs(recon - coords).max()
        err_plain = np.abs(plain - coords).max()
        # split: ~2^-16 relative; plain storage: ~2^-8 relative
        assert err_split < 2.0 ** -14 * np.abs(coords).max()
        assert err_plain > 30 * err_split

    def test_reconstruction_matches_true_delta(self, rng):
        """dx = (xyzq - hi) + (-lo) reconstructs the true delta (~1 ulp)."""
        from nsdp_tpu.ops.attention_pallas import _pack_xk

        M = 32
        coords = jnp.asarray(rng.randn(1, M, 3).astype(np.float32))
        xyzq = jnp.asarray(rng.randn(1, M, 3).astype(np.float32))
        tab = np.asarray(_pack_xk(coords, None, M)[0][0])
        xyzq8 = np.pad(np.asarray(xyzq[0]), ((0, 0), (0, 5)))
        dxh = xyzq8 - tab                         # [xyzq - hi | -lo | 0 0]
        dx = (dxh + np.roll(dxh, -3, axis=1))[:, :3]
        want = np.asarray((xyzq - coords)[0])
        np.testing.assert_allclose(dx, want, rtol=1e-5, atol=1e-6)

    def test_self_delta_is_exactly_zero(self, rng):
        """A query gathering ITSELF must reconstruct dx == +0.0 bitwise
        under an exact gather (interpreter mode, where every
        parity/training test runs) — at zero-init biases the self-slot
        relu preactivation sits exactly on the boundary and any residue
        there flips subgradients (the arbitrary-composition first-step
        gradient bug this pins).  On the MXU the gathered lo is itself
        bf16-truncated, leaving a ~2^-25-of-coordinate residue instead;
        see the kernel comment."""
        from nsdp_tpu.ops.attention_pallas import _pack_xk

        M = 32
        coords = jnp.asarray(rng.randn(1, M, 3).astype(np.float32))
        tab = np.asarray(_pack_xk(coords, None, M)[0][0])
        xyzq8 = np.pad(np.asarray(coords[0]), ((0, 0), (0, 5)))  # self
        dxh = xyzq8 - tab                         # [lo | -lo | 0 0]
        dx = (dxh + np.roll(dxh, -3, axis=1))[:, :3]
        np.testing.assert_array_equal(dx, np.zeros_like(dx))


class TestExactSelfFalse:
    """Cross-attention fast path: ``exact_self=False`` skips the per-slot
    roll reconstruction and feeds the raw split delta through duplicated
    fc_delta rows (``_split_w0(dup=True)``) — the round-4 recovery of the
    Dekker-split inference regression (scripts/ab_qps_drag.py).  Outputs
    and gradients must still match the XLA reference math; only the
    bitwise-exact self-delta property is given up."""

    def test_forward_cross_with_global(self, rng):
        B, N, A, d, k = 2, 60, 20, 10, 5
        xyz_q = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        kv = jnp.asarray(rng.randn(B, A, 3).astype(np.float32))
        qf = jnp.asarray(rng.randn(B, N, d).astype(np.float32))
        K = jnp.asarray(rng.randn(B, A, d).astype(np.float32))
        V = jnp.asarray(rng.randn(B, A, d).astype(np.float32))
        k_g = jnp.asarray(rng.randn(B, d).astype(np.float32))
        v_g = jnp.asarray(rng.randn(B, d).astype(np.float32))
        w = _weights(rng, d)
        ref = TestGlobalToken()._ref_global(xyz_q, kv, qf, K, V, k_g, v_g, w, k)
        got = fused_vector_attention(
            xyz_q, kv, qf, K, V, *w, k=k, tile=128, interpret=True,
            k_glob=k_g, v_glob=v_g, exact_self=False,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
        )

    def test_forward_matches_exact_self_variant(self, rng):
        # same inputs through both reconstructions: ulp-level agreement
        B, N, A, d, k = 1, 70, 24, 8, 6
        xyz_q = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        kv = jnp.asarray(rng.randn(B, A, 3).astype(np.float32))
        qf = jnp.asarray(rng.randn(B, N, d).astype(np.float32))
        K = jnp.asarray(rng.randn(B, A, d).astype(np.float32))
        V = jnp.asarray(rng.randn(B, A, d).astype(np.float32))
        w = _weights(rng, d)
        a = fused_vector_attention(
            xyz_q, kv, qf, K, V, *w, k=k, tile=128, interpret=True,
        )
        b = fused_vector_attention(
            xyz_q, kv, qf, K, V, *w, k=k, tile=128, interpret=True,
            exact_self=False,
        )
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )

    def test_grads_cross(self, rng):
        # validates the duplicated-dw0 backward: the fc_delta weight
        # gradient folds rows 3-5 onto 0-2, coordinate grads ride lanes
        # 0-2 unchanged
        from nsdp_tpu.ops.attention_pallas import knn_vector_attention

        B, M, S, d, k = 1, 120, 30, 8, 6
        kv = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
        centres = jnp.asarray(rng.randn(B, S, 3).astype(np.float32))
        qf = jnp.asarray(rng.randn(B, S, d).astype(np.float32))
        K = jnp.asarray(rng.randn(B, M, d).astype(np.float32))
        V = jnp.asarray(rng.randn(B, M, d).astype(np.float32))
        w = _weights(rng, d)

        ref = TestCustomVJP()._grads_ref((centres, kv, qf, K, V), w, k, False)

        def loss(xyz, kv, qf, K, V, *w):
            out = knn_vector_attention(
                xyz, kv, qf, K, V, None, None, None, *w, k, 128, True, False
            )
            return jnp.sum(out * out)

        got = jax.grad(loss, argnums=tuple(range(5 + 8)))(
            centres, kv, qf, K, V, *w
        )
        for i, (r, g) in enumerate(zip(ref, got)):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-3, atol=1e-4,
                err_msg=f"grad {i}",
            )

    def test_pos_only_rejected(self, rng):
        import pytest

        xyz = jnp.asarray(rng.randn(1, 32, 3).astype(np.float32))
        w = _weights(rng, 8)
        with pytest.raises(ValueError, match="exact_self"):
            fused_vector_attention(
                xyz, xyz, None, None, None, *w, k=4, tile=128,
                interpret=True, exact_self=False,
            )


def test_prefetch_gather_experiment_matches_onehot():
    """The scalar-prefetch dynamic-gather formulation (the VERDICT r3
    item-5 experiment, scripts/bench_gather_prefetch.py) produces the
    byte-identical gathered tensor as the one-hot MXU formulation — the
    precondition for its on-chip timing row in docs/PERFORMANCE.md."""
    from scripts.bench_gather_prefetch import check_equal

    assert check_equal(tiles=1, interpret=True)


class TestKVProj:
    """Project-in-kernel K/V mode (``knn_vector_attention_proj``).

    The kernel gathers the RAW kv feature table and computes
    ``K = feats @ wk`` / ``V = feats @ wv`` in VMEM (one packed gather per
    slot instead of two; one packed scatter backward) — results must match
    the projected-table path and the XLA reference math exactly up to dot
    order.  Used by the encoder's large-M featured sites
    (``kv_proj_profitable``): the forward net's begin block and the
    level-0 set abstractions (reference ``model/encoder/blocks.py:52-134,
    221-313`` semantics are unchanged)."""

    def _setup(self, rng, B, N, d, scale=0.3):
        xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        feats = jnp.asarray(rng.randn(B, N, d).astype(np.float32))
        wq = jnp.asarray(rng.randn(d, d).astype(np.float32) * scale)
        wk = jnp.asarray(rng.randn(d, d).astype(np.float32) * scale)
        wv = jnp.asarray(rng.randn(d, d).astype(np.float32) * scale)
        w = _weights(rng, d)
        return xyz, feats, wq, wk, wv, w

    def test_forward_matches_projected_table_path(self, rng):
        B, N, d, k = 2, 150, 12, 6
        xyz, feats, wq, wk, wv, w = self._setup(rng, B, N, d)
        q = feats @ wq
        std = fused_vector_attention(
            xyz, xyz, q, feats @ wk, feats @ wv, *w,
            k=k, tile=128, interpret=True,
        )
        got = fused_vector_attention(
            xyz, xyz, q, None, None, *w, k=k, tile=128, interpret=True,
            kv_feats=feats, wk=wk, wv=wv,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(std), rtol=1e-6, atol=1e-7
        )

    def test_forward_cross_with_mask(self, rng):
        # TSA pattern: FPS centres attend to the masked full cloud
        B, M, S, d, k = 2, 200, 40, 16, 8
        xyz, feats, wq, wk, wv, w = self._setup(rng, B, M, d)
        centres = xyz[:, :S]
        q = (feats @ wq)[:, :S]
        mask = jnp.asarray((rng.rand(B, M) > 0.3).astype(np.float32))
        mask = mask.at[:, :k].set(1.0)  # guarantee k selectable
        std = fused_vector_attention(
            centres, xyz, q, feats @ wk, feats @ wv, *w,
            k=k, tile=128, interpret=True, kv_mask=mask,
        )
        got = fused_vector_attention(
            centres, xyz, q, None, None, *w, k=k, tile=128, interpret=True,
            kv_mask=mask, kv_feats=feats, wk=wk, wv=wv,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(std), rtol=1e-6, atol=1e-7
        )

    def test_grads_match_xla_reference(self, rng):
        from nsdp_tpu.ops.attention_pallas import knn_vector_attention_proj

        B, N, d, k = 2, 96, 10, 5
        xyz, feats, wq, wk, wv, w = self._setup(rng, B, N, d)

        def loss_ref(xyz, feats, wq, wk, wv, *w):
            out = _ref_attention(
                xyz, xyz, feats @ wq, feats @ wk, feats @ wv, w, k, False
            )
            return jnp.sum(out * out)

        def loss_proj(xyz, feats, wq, wk, wv, *w):
            out = knn_vector_attention_proj(
                xyz, xyz, feats @ wq, feats, wk, wv, None, *w, k, 128, True
            )
            return jnp.sum(out * out)

        argnums = tuple(range(5 + 8))
        ref = jax.grad(loss_ref, argnums)(xyz, feats, wq, wk, wv, *w)
        got = jax.grad(loss_proj, argnums)(xyz, feats, wq, wk, wv, *w)
        names = ["xyz", "feats", "wq", "wk", "wv"]
        for i, (r, g) in enumerate(zip(ref, got)):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-3, atol=1e-4,
                err_msg=f"grad {names[i] if i < 5 else i}",
            )

    def test_grads_cross_masked_match_projected_path(self, rng):
        from nsdp_tpu.ops.attention_pallas import (
            knn_vector_attention, knn_vector_attention_proj)

        B, M, S, d, k = 1, 120, 30, 8, 6
        xyz, feats, wq, wk, wv, w = self._setup(rng, B, M, d)
        centres = jnp.asarray(rng.randn(B, S, 3).astype(np.float32))
        qf = jnp.asarray(rng.randn(B, S, d).astype(np.float32))
        mask = jnp.asarray((rng.rand(B, M) > 0.25).astype(np.float32))
        mask = mask.at[:, :k].set(1.0)

        def loss_std(centres, xyz, qf, feats, wk, wv, *w):
            out = knn_vector_attention(
                centres, xyz, qf, feats @ wk, feats @ wv,
                None, None, mask, *w, k, 128, True,
            )
            return jnp.sum(out * out)

        def loss_proj(centres, xyz, qf, feats, wk, wv, *w):
            out = knn_vector_attention_proj(
                centres, xyz, qf, feats, wk, wv, mask, *w, k, 128, True,
            )
            return jnp.sum(out * out)

        argnums = tuple(range(6 + 8))
        ref = jax.grad(loss_std, argnums)(centres, xyz, qf, feats, wk, wv, *w)
        got = jax.grad(loss_proj, argnums)(centres, xyz, qf, feats, wk, wv, *w)
        for i, (r, g) in enumerate(zip(ref, got)):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-5,
                err_msg=f"grad {i}",
            )

    def test_profitability_rule(self):
        from nsdp_tpu.ops.attention_pallas import kv_proj_profitable

        # flagship encoder sites (docs/PERFORMANCE.md per-site table)
        assert kv_proj_profitable(5000, 120, 120)   # featured begin
        assert kv_proj_profitable(5000, 120, 120)   # TSA level 0
        assert kv_proj_profitable(500, 120, 120)    # transformer_downs_0
        assert not kv_proj_profitable(500, 256, 256)   # TSA level 1
        assert not kv_proj_profitable(100, 256, 256)   # transformer_downs_1

    def test_validation(self, rng):
        import pytest

        xyz = jnp.asarray(rng.randn(1, 32, 3).astype(np.float32))
        feats = jnp.asarray(rng.randn(1, 32, 8).astype(np.float32))
        w8 = jnp.eye(8, dtype=jnp.float32)
        w = _weights(rng, 8)
        with pytest.raises(ValueError, match="wk and wv"):
            fused_vector_attention(
                xyz, xyz, feats, None, None, *w, k=4, interpret=True,
                kv_feats=feats,
            )
        with pytest.raises(ValueError, match="replaces K_a/V_a"):
            fused_vector_attention(
                xyz, xyz, feats, feats, None, *w, k=4, interpret=True,
                kv_feats=feats, wk=w8, wv=w8,
            )
