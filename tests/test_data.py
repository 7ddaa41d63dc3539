"""Data pipeline tests over the synthetic fixture."""

import os

import numpy as np
import pytest

from nsdp_tpu.data import dataset_dict, DataLoader
from nsdp_tpu.data.datasets import Deform4DFlowDataset
from nsdp_tpu.data.synthetic import (
    generate_synthetic_dataset,
    synthetic_config,
)
from nsdp_tpu.data import transforms as T
from nsdp_tpu.utils import meshio


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return generate_synthetic_dataset(
        str(root), n_identities=2, n_motions_per_identity=1, n_frames=3
    )


class TestMeshIO:
    def test_obj_roundtrip(self, tmp_path):
        from nsdp_tpu.data.synthetic import icosphere

        verts, faces = icosphere(1)
        path = str(tmp_path / "m.obj")
        meshio.save_mesh(path, verts, faces)
        v2, f2 = meshio.load_mesh(path)
        np.testing.assert_allclose(v2, verts, atol=1e-5)
        np.testing.assert_array_equal(f2, faces)

    def test_ply_roundtrip_with_colors(self, tmp_path):
        from nsdp_tpu.data.synthetic import icosphere

        verts, faces = icosphere(0)
        colors = np.random.RandomState(0).randint(
            0, 255, size=(len(verts), 3)
        ).astype(np.uint8)
        path = str(tmp_path / "m.ply")
        meshio.save_mesh(path, verts, faces, vertex_colors=colors)
        v2, f2 = meshio.load_mesh(path)
        np.testing.assert_allclose(v2, verts, atol=1e-5)
        np.testing.assert_array_equal(f2, faces)

    def test_face_normals_unit(self):
        from nsdp_tpu.data.synthetic import icosphere

        verts, faces = icosphere(1)
        n = meshio.face_normals(verts, faces)
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)

    def test_sample_surface_on_surface(self):
        # all samples of a unit icosphere lie within the sphere hull
        from nsdp_tpu.data.synthetic import icosphere

        verts, faces = icosphere(2)
        pts = meshio.sample_surface(verts, faces, 500, np.random.RandomState(0))
        r = np.linalg.norm(pts, axis=1)
        assert (r <= 1.0 + 1e-5).all() and (r > 0.8).all()

    def test_edges_bidirectional(self):
        faces = np.array([[0, 1, 2]])
        e = meshio.edges_bidirectional(faces)
        pairs = set(map(tuple, e.tolist()))
        assert (0, 1) in pairs and (1, 0) in pairs and (2, 0) in pairs


class TestTransforms:
    def test_handle_mask_bbox(self):
        pts = np.array(
            [[0, 0, 0.5], [0, -0.95, 0.5], [0, 0.95, 0.5], [0, 0, -0.95]],
            dtype=np.float32,
        )
        bmin, bmax = pts.min(0), pts.max(0)
        mask = T.handle_mask_bbox(pts, bmin, bmax, 0.1)
        np.testing.assert_array_equal(mask, [False, True, True, True])

    def test_fix_coord_system(self):
        p = np.array([[1.0, 2.0, 3.0]])
        np.testing.assert_allclose(T.fix_coord_system(p), [[1.0, -3.0, 2.0]])

    def test_subsample_shared_correspondence(self, rng):
        a = rng.randn(100, 3)
        b = a + 1.0
        (sa, sb), idxs = T.subsample_shared([a, b], 10, rng=np.random.RandomState(1))
        np.testing.assert_allclose(sb - sa, 1.0)
        assert len(idxs) == 10

    def test_partial_shape_indices(self, rng):
        pts = rng.randn(200, 3).astype(np.float32)
        handle = np.zeros(200, dtype=bool)
        keep = T.partial_shape_indices(
            pts, handle, 0.5, rng=np.random.RandomState(0)
        )
        assert len(keep) < 200

    def test_user_defined_handles_translation(self):
        verts = np.array(
            [[0, -0.95, 0.5], [0, 0, 0.5], [0, 0.95, 0.5]], dtype=np.float32
        )
        cfg = {
            "head": True, "tail": False, "cliptail": False,
            "frontleftfoot": False, "frontrightfoot": False,
            "behindleftfoot": False, "behindrightfoot": False,
            "xtrans": 0.1, "ytrans": 0.0, "ztrans": 0.0,
        }
        bmin, bmax = verts.min(0), verts.max(0)
        mask, tgt = T.user_defined_handles(cfg, verts, bmin, bmax, verts, 0.1)
        # only the head vertex moved, by exactly xtrans
        np.testing.assert_allclose(tgt[0] - verts[0], [0.1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(tgt[1], verts[1])


class TestDeform4DDataset:
    def _cfg(self, fixture, arbitrary=False):
        return synthetic_config(fixture, arbitrary=arbitrary)

    def test_pair_counts_nonarbitrary(self, fixture):
        ds = Deform4DFlowDataset(
            self._cfg(fixture), "identity_seen", "test_unseen_motions"
        )
        # canonical -> each frame: n_seq * n_frames pairs
        assert len(ds.all_deform_pairs) == 2 * 3

    def test_pair_counts_arbitrary_train(self, fixture):
        ds = Deform4DFlowDataset(
            self._cfg(fixture, arbitrary=True), "identity_seen", "train_seen"
        )
        assert len(ds.all_deform_pairs) == 2 * 3 * 3

    def test_pair_counts_arbitrary_test(self, fixture):
        ds = Deform4DFlowDataset(
            self._cfg(fixture, arbitrary=True),
            "identity_seen",
            "test_unseen_motions",
        )
        # frame 0000 -> each frame>0
        assert len(ds.all_deform_pairs) == 2 * 2

    def test_item_shapes(self, fixture):
        cfg = self._cfg(fixture)
        ds = Deform4DFlowDataset(
            cfg, "identity_seen", "test_unseen_motions", load_mesh=True
        )
        item = ds[0]
        ns = cfg["data"]["num_surf_samples"]
        assert item["surface_samples_inputs"].shape == (ns, 7)
        assert item["surface_samples_src"].shape == (ns, 3)
        assert item["space_samples_src"].shape[1] == 3
        assert item["verts_src"].shape == item["verts_tgt"].shape
        assert item["faces"].ndim == 2
        # mask channel is the 7th input channel
        np.testing.assert_allclose(
            item["surface_samples_inputs"][:, 6],
            item["cano_handle_sample_idx"][:, 0],
        )

    def test_correspondence_preserved(self, fixture):
        """src and tgt surface samples use the same point index ordering:
        frame 0 -> frame 0 pairs must produce identical src/tgt arrays."""
        cfg = self._cfg(fixture)
        ds = Deform4DFlowDataset(cfg, "identity_seen", "test_unseen_motions")
        for i in range(len(ds)):
            info = ds.get_metadata(i)["pair_info"]
            if info[5] == info[7] and info[4] == info[6]:  # same frame
                item = ds[i]
                np.testing.assert_allclose(
                    item["surface_samples_src"], item["surface_samples_tgt"]
                )
                break

    def test_masked_target_channel(self, fixture):
        cfg = self._cfg(fixture)
        ds = Deform4DFlowDataset(cfg, "identity_seen", "test_unseen_motions")
        item = ds[0]
        inputs = item["surface_samples_inputs"]
        mask = inputs[:, 6:7]
        np.testing.assert_allclose(
            inputs[:, 3:6], item["surface_samples_tgt"] * mask, atol=1e-6
        )

    def test_use_normals_inputs_10ch(self, fixture):
        """With model.use_normals the conditioning becomes
        [src xyz, src normals, tgt*mask, mask] (channel contract in
        models/deformation.py)."""
        cfg = self._cfg(fixture)
        cfg["model"]["use_normals"] = True
        ds = Deform4DFlowDataset(cfg, "identity_seen", "test_unseen_motions")
        item = ds[0]
        inputs = item["surface_samples_inputs"]
        assert inputs.shape[-1] == 10
        np.testing.assert_allclose(
            inputs[:, 3:6], item["surface_normals_src"], atol=1e-6
        )
        mask = inputs[:, 9:10]
        np.testing.assert_allclose(
            inputs[:, 6:9], item["surface_samples_tgt"] * mask, atol=1e-6
        )

    def test_frame_cache_equivalence(self, fixture):
        """Items assembled from cached frames are identical to uncached
        ones (cache entries are read-only by contract), and the cache obeys
        its cap."""
        cfg_on = self._cfg(fixture)
        cfg_off = self._cfg(fixture)
        cfg_off["data"]["cache_frames"] = 0
        ds_on = Deform4DFlowDataset(
            cfg_on, "identity_seen", "test_unseen_motions",
            rng=np.random.RandomState(0),
        )
        ds_off = Deform4DFlowDataset(
            cfg_off, "identity_seen", "test_unseen_motions",
            rng=np.random.RandomState(0),
        )
        for i in range(min(4, len(ds_on))):
            np.random.seed(i)  # unseeded global draws inside __getitem__
            a = ds_on[i]
            np.random.seed(i)
            b = ds_off[i]
            for k in a:
                np.testing.assert_array_equal(
                    np.asarray(a[k]), np.asarray(b[k]), err_msg=k
                )
        # second epoch hits the cache; results still identical
        np.random.seed(0)
        a2 = ds_on[0]
        np.random.seed(0)
        b2 = ds_off[0]
        np.testing.assert_array_equal(
            a2["surface_samples_inputs"], b2["surface_samples_inputs"]
        )
        assert len(ds_on._frame_cache) <= ds_on._frame_cache_cap
        assert len(ds_off._frame_cache) == 0

    def test_loader_batching(self, fixture):
        cfg = self._cfg(fixture)
        ds = Deform4DFlowDataset(cfg, "identity_seen", "test_unseen_motions")
        loader = DataLoader(ds, batch_size=2, shuffle=True, seed=0,
                            drop_last=True, num_workers=2)
        batches = list(loader)
        assert len(batches) == len(ds) // 2
        b = batches[0]
        assert b["surface_samples_inputs"].shape[0] == 2

    def test_registry(self):
        assert set(dataset_dict) == {
            "deform4d", "deformtransfer", "tosca", "dogrec"
        }


class _CountingDataset:
    """Module-level (picklable) dataset that counts assembled items."""

    def __init__(self, n):
        import threading

        self.n = n
        self.assembled = 0
        self.lock = threading.Lock()

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        with self.lock:
            self.assembled += 1
        return np.float32(i)

    @staticmethod
    def collate_fn(items):
        return np.stack(items)


class TestLoaderPrefetchBound:
    def test_slow_consumer_never_accumulates(self):
        """A stalled consumer must never hold more than
        (prefetch + num_workers) assembled batches — the round-1 loader
        submitted the whole epoch up front and buffered every completed
        batch (multi-GB at stage-2 scale)."""
        import time

        ds = _CountingDataset(128)
        loader = DataLoader(ds, batch_size=2, num_workers=2, prefetch=2)
        window_items = (loader.prefetch + loader.num_workers) * 2
        consumed = 0
        max_ahead = 0
        out = []
        for batch in loader:
            out.append(batch)
            consumed += 2
            time.sleep(0.005)  # slow consumer; workers are near-instant
            with ds.lock:
                max_ahead = max(max_ahead, ds.assembled - consumed)
        assert consumed == 128
        # one extra batch of slack: the refill submitted just before yield
        assert max_ahead <= window_items + 2, max_ahead
        np.testing.assert_array_equal(
            np.concatenate(out), np.arange(128, dtype=np.float32)
        )

    def test_early_abandon_shuts_down(self):
        ds = _CountingDataset(64)
        loader = DataLoader(ds, batch_size=2, num_workers=2, prefetch=1)
        it = iter(loader)
        next(it)
        it.close()  # consumer abandons mid-epoch; no hang, no leak

    def test_process_workers(self):
        ds = _PicklableDataset(16)
        loader = DataLoader(
            ds, batch_size=4, num_workers=2, worker_type="process"
        )
        out = np.concatenate(list(loader))
        np.testing.assert_array_equal(out, np.arange(16, dtype=np.float32))


class _PicklableDataset:
    """Lock-free dataset shipped to spawn-based process workers."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.float32(i)

    @staticmethod
    def collate_fn(items):
        return np.stack(items)
