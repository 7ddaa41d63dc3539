"""Static-shape partial point clouds (``data.pad_partial_shapes``).

The reference's partial-shape training (KD-tree holes,
``dataset/utils.py:79-101``) produces variable-size items that only collate
at batch 1.  The TPU-native variant keeps static shapes: surviving rows are
compacted to the front, zero-padded back to ``num_surf_samples`` (padded
rows sit at the origin, which FPS never selects — the reference CUDA
kernel's ``||p||^2 <= 1e-3`` skip), and a ``surface_valid_mask`` removes
padded rows from kNN neighbourhoods and full-resolution BatchNorm
statistics.

Every test here asserts the padded-and-masked computation equals the same
computation on the compacted (unpadded) arrays.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nsdp_tpu.ops.knn import knn_xla
from nsdp_tpu.ops.knn_pallas import knn_pallas


def _prefix_case(rng, n=96, n_valid=60, b=2):
    pts = rng.randn(b, n, 3).astype(np.float32)
    pts[:, n_valid:] = 0.0  # padding at the origin
    mask = np.zeros((b, n), np.float32)
    mask[:, :n_valid] = 1.0
    return jnp.asarray(pts), jnp.asarray(mask), n_valid


class TestMaskedKnn:
    def test_knn_xla_prefix_mask(self, rng):
        pts, mask, n_valid = _prefix_case(rng)
        q = jnp.asarray(rng.randn(2, 40, 3).astype(np.float32))
        got = knn_xla(q, pts, 5, kv_mask=mask)
        want = knn_xla(q, pts[:, :n_valid], 5)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_knn_pallas_prefix_mask(self, rng):
        pts, mask, n_valid = _prefix_case(rng)
        q = jnp.asarray(rng.randn(2, 40, 3).astype(np.float32))
        got = knn_pallas(q, pts, 5, interpret=True, kv_mask=mask)
        want = knn_pallas(q, pts[:, :n_valid], 5, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_knn_scattered_mask(self, rng):
        # the ops-level mask is general, not only prefix-shaped
        pts = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))
        keep = np.sort(rng.permutation(64)[:40])
        mask = np.zeros((1, 64), np.float32)
        mask[0, keep] = 1.0
        q = jnp.asarray(rng.randn(1, 32, 3).astype(np.float32))
        got = knn_xla(q, pts, 4, kv_mask=jnp.asarray(mask))
        want_local = knn_xla(q, pts[:, keep], 4)
        want = keep[np.asarray(want_local)[0]]
        np.testing.assert_array_equal(np.asarray(got)[0], want)


class TestMaskedFusedAttention:
    def test_forward_equals_compacted(self, rng):
        from nsdp_tpu.ops.attention_pallas import fused_vector_attention

        d, k = 8, 4
        pts, mask, n_valid = _prefix_case(rng, n=80, n_valid=50, b=1)
        q_xyz = jnp.asarray(rng.randn(1, 32, 3).astype(np.float32))
        qf = jnp.asarray(rng.randn(1, 32, d).astype(np.float32))
        K = jnp.asarray(rng.randn(1, 80, d).astype(np.float32))
        V = jnp.asarray(rng.randn(1, 80, d).astype(np.float32))
        w = [
            rng.randn(3, d).astype(np.float32),
            rng.randn(d).astype(np.float32),
            rng.randn(d, d).astype(np.float32),
            rng.randn(d).astype(np.float32),
            rng.randn(d, d).astype(np.float32),
            rng.randn(d).astype(np.float32),
            rng.randn(d, d).astype(np.float32),
            rng.randn(d).astype(np.float32),
        ]
        w = [jnp.asarray(x) for x in w]
        got = fused_vector_attention(
            q_xyz, pts, qf, K, V, *w, k=k, interpret=True, kv_mask=mask
        )
        want = fused_vector_attention(
            q_xyz, pts[:, :n_valid], qf, K[:, :n_valid], V[:, :n_valid],
            *w, k=k, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
        )

    def test_grads_equal_compacted(self, rng):
        from nsdp_tpu.ops.attention_pallas import knn_vector_attention

        d, k = 6, 3
        pts, mask, n_valid = _prefix_case(rng, n=64, n_valid=40, b=1)
        qf = jnp.asarray(rng.randn(1, 24, d).astype(np.float32))
        q_xyz = jnp.asarray(rng.randn(1, 24, 3).astype(np.float32))
        K = jnp.asarray(rng.randn(1, 64, d).astype(np.float32))
        V = jnp.asarray(rng.randn(1, 64, d).astype(np.float32))
        w = [
            jnp.asarray(rng.randn(3, d).astype(np.float32)),
            jnp.asarray(rng.randn(d).astype(np.float32)),
            jnp.asarray(rng.randn(d, d).astype(np.float32)),
            jnp.asarray(rng.randn(d).astype(np.float32)),
            jnp.asarray(rng.randn(d, d).astype(np.float32)),
            jnp.asarray(rng.randn(d).astype(np.float32)),
            jnp.asarray(rng.randn(d, d).astype(np.float32)),
            jnp.asarray(rng.randn(d).astype(np.float32)),
        ]

        def loss_masked(qf, K, V, *w):
            out = knn_vector_attention(
                q_xyz, pts, qf, K, V, None, None, mask, *w, k, 128, True
            )
            return jnp.sum(out**2)

        def loss_compact(qf, K, V, *w):
            out = knn_vector_attention(
                q_xyz, pts[:, :n_valid], qf, K[:, :n_valid], V[:, :n_valid],
                None, None, None, *w, k, 128, True,
            )
            return jnp.sum(out**2)

        argnums = tuple(range(3 + 8))
        g_masked = jax.grad(loss_masked, argnums)(qf, K, V, *w)
        g_compact = jax.grad(loss_compact, argnums)(qf, K, V, *w)
        # query grads identical; K/V grads of padded rows must be zero
        np.testing.assert_allclose(
            np.asarray(g_masked[0]), np.asarray(g_compact[0]),
            rtol=1e-5, atol=1e-6,
        )
        for i in (1, 2):
            # loss_compact slices inside, so its K/V grads are full-shaped
            # with zeros on the padded rows — same contract as the mask
            np.testing.assert_allclose(
                np.asarray(g_masked[i]), np.asarray(g_compact[i]),
                rtol=1e-5, atol=1e-6,
            )
            assert np.all(np.asarray(g_masked[i])[:, n_valid:] == 0.0)
        for i in range(3, 11):
            np.testing.assert_allclose(
                np.asarray(g_masked[i]), np.asarray(g_compact[i]),
                rtol=1e-5, atol=1e-6,
            )


class TestMaskedBatchNorm:
    def test_stats_equal_compacted(self, rng):
        from nsdp_tpu.nn.blocks import BatchNorm

        bn = BatchNorm()
        x = jnp.asarray(rng.randn(2, 50, 8).astype(np.float32))
        x_pad = jnp.concatenate([x, jnp.zeros((2, 14, 8))], axis=1)
        mask = jnp.concatenate(
            [jnp.ones((2, 50)), jnp.zeros((2, 14))], axis=1
        )
        variables = bn.init(jax.random.PRNGKey(0), x, True)
        y, mut = bn.apply(variables, x, True, mutable=["batch_stats"])
        y_pad, mut_pad = bn.apply(
            variables, x_pad, True, mask, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(
            np.asarray(y_pad)[:, :50], np.asarray(y), rtol=1e-5, atol=1e-6
        )
        for kk in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mut_pad["batch_stats"]["bn"][kk]),
                np.asarray(mut["batch_stats"]["bn"][kk]),
                rtol=1e-5, atol=1e-7,
            )


def _partial_inputs(rng, n=96, n_valid=64, b=1, channels=7):
    """A padded conditioning tensor + its compacted equivalent."""
    src = rng.randn(b, n_valid, 3).astype(np.float32)
    tgt = rng.randn(b, n_valid, 3).astype(np.float32)
    handle = (rng.rand(b, n_valid, 1) > 0.5).astype(np.float32)
    compact = np.concatenate([src, tgt * handle, handle], axis=-1)
    padded = np.zeros((b, n, channels), np.float32)
    padded[:, :n_valid] = compact
    mask = np.zeros((b, n), np.float32)
    mask[:, :n_valid] = 1.0
    return (
        jnp.asarray(padded),
        jnp.asarray(compact),
        jnp.asarray(mask),
    )


def _tiny_config(model_type, encoder="pointransformer", fused=False, n=96):
    from nsdp_tpu.data.synthetic import synthetic_config

    cfg = synthetic_config({"dataset_dir": "", "split_dir": ""},
                           model_type=model_type, n_surface=n)
    cfg["model"]["encoder"] = encoder
    cfg["model"]["encoder_kwargs"]["npoints_per_layer"] = [n, 24, 12]
    if encoder == "pointnet++":
        for k in ("nneighbor_reduced", "d_reduced", "full_SA"):
            cfg["model"]["encoder_kwargs"].pop(k, None)
    cfg["model"]["fused_attention"] = fused
    return cfg


@pytest.mark.parametrize(
    "model_type,encoder,fused",
    [
        # the backward case is the smoke tier's padded-parity
        # representative (cheapest: no composition, no fused interpret
        # pass); the rest are 30–70 s each on this box
        pytest.param("forward", "pointransformer", False,
                     marks=pytest.mark.slow),
        ("backward", "pointransformer", False),
        pytest.param("forward", "pointnet++", False,
                     marks=pytest.mark.slow),
        pytest.param("forward", "pointransformer", True,
                     marks=pytest.mark.slow),
        pytest.param("arbitrary", "pointransformer", False,
                     marks=pytest.mark.slow),
        pytest.param("arbitrary", "pointransformer", True,
                     marks=pytest.mark.slow),
    ],
)
def test_model_padded_equals_compacted(rng, model_type, encoder, fused):
    """Forward pass on padded+masked conditioning == compacted conditioning."""
    from nsdp_tpu.models import build_model
    from nsdp_tpu.training import create_train_state, optimizer_factory

    cfg = _tiny_config(model_type, encoder=encoder, fused=fused)
    model = build_model(cfg)
    padded, compact, mask = _partial_inputs(rng)
    queries = jnp.asarray(rng.randn(1, 40, 3).astype(np.float32))

    _, tx = optimizer_factory(cfg["training"])
    if model_type == "arbitrary":
        example = (queries, compact[:, :, 0:3], compact[:, :, 3:6],
                   compact[:, :, 6:7])
    else:
        example = (queries, compact)
    state = create_train_state(model, jax.random.PRNGKey(0), example, tx)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def run(inputs, point_mask):
        if model_type == "arbitrary":
            args = (queries, inputs[:, :, 0:3], inputs[:, :, 3:6],
                    inputs[:, :, 6:7])
        else:
            args = (queries, inputs)
        return model.apply(variables, *args, train=False,
                           point_mask=point_mask)

    want = np.asarray(run(compact, None))
    got = np.asarray(run(padded, mask))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_train_step_padded_equals_compacted(rng):
    """One train step (loss + BN running stats) matches the compacted run."""
    from nsdp_tpu.models import build_model
    from nsdp_tpu.training import create_train_state, optimizer_factory
    from nsdp_tpu.training.steps import make_steps

    cfg = _tiny_config("forward")
    model = build_model(cfg)
    padded, compact, mask = _partial_inputs(rng)
    queries = jnp.asarray(rng.randn(1, 40, 3).astype(np.float32))
    targets = jnp.asarray(rng.randn(1, 40, 3).astype(np.float32))

    _, tx = optimizer_factory(cfg["training"])

    losses, stats = [], []
    for inputs, m in ((compact, None), (padded, mask)):
        state = create_train_state(
            model, jax.random.PRNGKey(0), (queries, compact), tx
        )
        steps = make_steps(model, "forward", tx)
        batch = {
            "space_samples_src": queries,
            "space_samples_tgt": targets,
            "surface_samples_inputs": inputs,
        }
        if m is not None:
            batch["surface_valid_mask"] = m
        state, loss = steps["train_step"](state, batch, 1e-3)
        losses.append(float(loss))
        stats.append(jax.tree.map(np.asarray, state.batch_stats))

    np.testing.assert_allclose(losses[1], losses[0], rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves(stats[0])
    flat1 = jax.tree_util.tree_leaves(stats[1])
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6)


def test_bool_mask_grad(rng):
    """A bool validity mask must work under jax.grad (float0 cotangent)."""
    from nsdp_tpu.ops.attention_pallas import knn_vector_attention

    d, k = 6, 3
    pts, mask, _ = _prefix_case(rng, n=64, n_valid=40, b=1)
    bool_mask = jnp.asarray(np.asarray(mask) != 0)
    qf = jnp.asarray(rng.randn(1, 24, d).astype(np.float32))
    q_xyz = jnp.asarray(rng.randn(1, 24, 3).astype(np.float32))
    K = jnp.asarray(rng.randn(1, 64, d).astype(np.float32))
    V = jnp.asarray(rng.randn(1, 64, d).astype(np.float32))
    w = [jnp.asarray(rng.randn(*s).astype(np.float32))
         for s in [(3, d), (d,), (d, d), (d,), (d, d), (d,), (d, d), (d,)]]

    def loss(qf):
        out = knn_vector_attention(
            q_xyz, pts, qf, K, V, None, None, bool_mask, *w, k, 128, True
        )
        return jnp.sum(out**2)

    g = jax.grad(loss)(qf)
    assert np.isfinite(np.asarray(g)).all()


def test_pad_partial_min_valid_raises(rng):
    """Keeping fewer rows than the encoder minimum must fail loudly."""
    from nsdp_tpu.data import transforms as T

    arrays = {"a": rng.randn(64, 3).astype(np.float32)}
    keep = np.arange(5)
    with pytest.raises(ValueError, match="below the encoder's minimum"):
        T.pad_partial_static(keep, arrays, min_valid=16)
    padded, valid = T.pad_partial_static(keep, arrays, min_valid=5)
    assert int(valid.sum()) == 5 and padded["a"].shape == (64, 3)


def test_min_valid_points_from_config():
    from nsdp_tpu.data import transforms as T

    cfg = {"model": {"encoder_kwargs": {
        "npoints_per_layer": [128, 24, 12], "nneighbor": 8,
        "nneighbor_reduced": 6,
    }}}
    assert T.min_valid_points(cfg) == 24
    assert T.min_valid_points({}) == 1


@pytest.mark.slow
@pytest.mark.parametrize("model_type", ["forward", "arbitrary"])
def test_fast_predict_masked_equals_compacted(rng, model_type):
    """The fused inference path honours point_mask (with_mask=True)."""
    from nsdp_tpu.models import build_model
    from nsdp_tpu.models.fast_predict import make_fast_predict
    from nsdp_tpu.training import create_train_state, optimizer_factory

    cfg = _tiny_config(model_type, fused=True)
    model = build_model(cfg)
    padded, compact, mask = _partial_inputs(rng)
    queries = jnp.asarray(rng.randn(1, 40, 3).astype(np.float32))

    _, tx = optimizer_factory(cfg["training"])
    if model_type == "arbitrary":
        example = (queries, compact[:, :, 0:3], compact[:, :, 3:6],
                   compact[:, :, 6:7])
    else:
        example = (queries, compact)
    state = create_train_state(model, jax.random.PRNGKey(0), example, tx)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    nneigh = cfg["model"]["decoder_kwargs"]["nneigh"]

    plain = make_fast_predict(model, variables, model_type, nneigh=nneigh,
                              interpret=True)
    masked = make_fast_predict(model, variables, model_type, nneigh=nneigh,
                               interpret=True, with_mask=True)
    want = np.asarray(plain(queries, compact))
    got = np.asarray(masked(queries, padded, mask))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_serving_masked_deform(rng):
    """DeformationService.deform accepts a validity mask on the fused path."""
    from nsdp_tpu.serving import DeformationService

    cfg = _tiny_config("forward", fused=True)
    cfg["data"].update(type="deform4d", dataset_dir=".", split_dir=".")
    svc = DeformationService(cfg, buckets=(64,), use_fused=True,
                            interpret=True)
    padded, compact, mask = _partial_inputs(rng)
    queries = rng.randn(40, 3).astype(np.float32)
    want = svc.deform(queries, np.asarray(compact)[0])
    got = svc.deform(queries, np.asarray(padded)[0], np.asarray(mask)[0])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dataset_default_rng_follows_global_seed(tmp_path):
    """The CLIs seed np.random; the dataset's default Generator must derive
    from it so --seed controls subsampling/noise/holes (reference
    behaviour, train.py:66)."""
    from nsdp_tpu.data import dataset_dict
    from nsdp_tpu.data.synthetic import generate_synthetic_dataset, synthetic_config

    fx = generate_synthetic_dataset(str(tmp_path), n_identities=1,
                                    n_frames=2, n_surface=64, n_space=64)
    cfg = synthetic_config(fx, n_surface=32, n_space=32)

    def first_item():
        ds = dataset_dict[cfg["data"]["type"]](
            cfg, "identity_seen", "train_seen", load_mesh=False
        )
        return ds[0]["surface_samples_src"]

    np.random.seed(123)
    a = first_item()
    np.random.seed(123)
    b = first_item()
    np.random.seed(7)
    c = first_item()
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_subsample_shared_lenient_oversample(rng):
    """num_samples >= n keeps the legacy all-rows semantics (no raise)."""
    from nsdp_tpu.data import transforms as T

    a = rng.randn(10, 3).astype(np.float32)
    (out,), idxs = T.subsample_shared([a], 32, rng=np.random.default_rng(0))
    assert out.shape == (10, 3) and sorted(idxs.tolist()) == list(range(10))


def test_dataset_pad_partial_collates(rng, tmp_path):
    """Partial-shape items collate at batch > 1 with pad_partial_shapes."""
    from nsdp_tpu.data import dataset_dict, DataLoader
    from nsdp_tpu.data.synthetic import generate_synthetic_dataset, synthetic_config

    fx = generate_synthetic_dataset(str(tmp_path), n_identities=1,
                                    n_frames=3, n_surface=200, n_space=200)
    cfg = synthetic_config(fx, n_surface=128, n_space=128)
    cfg["data"]["partial_shape_ratio"] = 0.6
    cfg["data"]["pad_partial_shapes"] = True

    ds = dataset_dict[cfg["data"]["type"]](
        cfg, "identity_seen", "train_seen", load_mesh=False
    )
    item = ds[0]
    n = cfg["data"]["num_surf_samples"]
    assert item["surface_samples_inputs"].shape == (n, 7)
    mask = item["surface_valid_mask"]
    assert mask.shape == (n,)
    n_valid = int(mask.sum())
    assert 0 < n_valid < n
    # prefix layout: valid rows first, padded rows zero
    assert np.all(mask[:n_valid] == 1.0) and np.all(mask[n_valid:] == 0.0)
    assert np.all(item["surface_samples_inputs"][n_valid:] == 0.0)
    assert np.all(item["surface_samples_src"][n_valid:] == 0.0)

    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=0)
    batch = next(iter(loader))
    assert batch["surface_samples_inputs"].shape == (2, n, 7)
    assert batch["surface_valid_mask"].shape == (2, n)
