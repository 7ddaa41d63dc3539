"""DeformTransfer and user-handle dataset classes over synthetic fixtures."""

import os

import numpy as np
import pytest

from nsdp_tpu.data.datasets import (
    DeformTransferFlowDataset,
    DeformUserhandleDataset,
)
from nsdp_tpu.data.synthetic import (
    generate_synthetic_dataset,
    synthetic_config,
    icosphere,
    deform_frame,
)
from nsdp_tpu.utils import meshio


@pytest.fixture(scope="module")
def dt_fixture(tmp_path_factory):
    """DeformationTransfer-style fixture: sequences named like the animals
    whose fixed source frames differ (cat/horse/other)."""
    root = tmp_path_factory.mktemp("dt")
    fx = generate_synthetic_dataset(
        str(root), n_identities=1, n_motions_per_identity=1, n_frames=6
    )
    # rename the sequence dirs to animal names + write matching splits
    base = fx["dataset_dir"]
    os.rename(
        os.path.join(base, "id0_m0"), os.path.join(base, "cat_poses")
    )
    horse = os.path.join(base, "horse_gallop")
    os.symlink(os.path.join(base, "cat_poses"), horse)
    os.makedirs(os.path.join(fx["split_dir"], "deformtransfer"), exist_ok=True)
    for split in ("identity_unseen", "test_unseen_identities"):
        with open(
            os.path.join(fx["split_dir"], "deformtransfer", split + ".lst"), "w"
        ) as f:
            f.write("cat_poses\nhorse_gallop\n")
    return fx


def test_deformtransfer_source_frames(dt_fixture):
    cfg = synthetic_config(dt_fixture, arbitrary=True)
    cfg["data"]["type"] = "deformtransfer"
    cfg["data"]["fix_coord_system"] = True
    ds = DeformTransferFlowDataset(
        cfg, "identity_unseen", "test_unseen_identities"
    )
    # frame>0 targets per sequence: frames 1..5 -> 5 pairs per sequence
    assert len(ds.all_deform_pairs) == 2 * 5
    by_seq = {}
    for p in ds.all_deform_pairs:
        info = p["pair_info"]
        by_seq.setdefault(info[4], set()).add(info[5])
    assert by_seq["cat_poses"] == {"0003"}   # cat -> source frame 0003
    assert by_seq["horse_gallop"] == {"0005"}  # horse -> 0005

    item = ds[0]
    assert item["surface_samples_inputs"].shape[1] == 7
    assert np.isfinite(item["space_samples_src"]).all()


def test_deformtransfer_fix_coord_applied(dt_fixture):
    cfg = synthetic_config(dt_fixture, arbitrary=True)
    cfg["data"]["type"] = "deformtransfer"
    ds_plain = DeformTransferFlowDataset(
        cfg, "identity_unseen", "test_unseen_identities"
    )
    cfg2 = synthetic_config(dt_fixture, arbitrary=True)
    cfg2["data"]["type"] = "deformtransfer"
    cfg2["data"]["fix_coord_system"] = True
    ds_fixed = DeformTransferFlowDataset(
        cfg2, "identity_unseen", "test_unseen_identities"
    )
    rng_a, rng_b = np.random.RandomState(0), np.random.RandomState(0)
    ds_plain.rng, ds_fixed.rng = rng_a, rng_b
    a = ds_plain[0]["surface_samples_src"]
    b = ds_fixed[0]["surface_samples_src"]
    # (x, y, z) -> (x, -z, y)
    np.testing.assert_allclose(b[:, 0], a[:, 0], atol=1e-6)
    np.testing.assert_allclose(b[:, 1], -a[:, 2], atol=1e-6)
    np.testing.assert_allclose(b[:, 2], a[:, 1], atol=1e-6)


@pytest.fixture(scope="module")
def uh_fixture(tmp_path_factory):
    """TOSCA-style mesh-only fixture: model dirs with a single 0000 frame
    containing only orig_to_gaps.txt + model_normalized.obj."""
    root = tmp_path_factory.mktemp("uh")
    dataset_dir = root / "frames"
    split_dir = root / "splits" / "tosca"
    split_dir.mkdir(parents=True)
    verts, faces = icosphere(1)
    for name in ("cat0", "dog1"):
        frame = dataset_dir / name / "0000"
        frame.mkdir(parents=True)
        np.savetxt(str(frame / "orig_to_gaps.txt"), np.eye(4))
        meshio.save_mesh(
            str(frame / "model_normalized.obj"),
            deform_frame(verts, 0.2, 1), faces,
        )
    with open(split_dir / "test_unseen_identities.lst", "w") as f:
        f.write("cat0\ndog1\n")
    with open(split_dir / "identity_unseen.lst", "w") as f:
        f.write("cat0\ndog1\n")
    return {"dataset_dir": str(dataset_dir), "split_dir": str(root / "splits")}


def test_userhandle_dataset(uh_fixture):
    cfg = synthetic_config(uh_fixture, arbitrary=True)
    cfg["data"]["type"] = "tosca"
    cfg["data"]["mesh_file"] = "model_normalized.obj"
    cfg["data"]["userhandle"] = {
        "cliptail": False, "head": True, "tail": False,
        "frontleftfoot": False, "frontrightfoot": False,
        "behindleftfoot": False, "behindrightfoot": False,
        "xtrans": -0.15, "ytrans": -0.2, "ztrans": -0.2,
    }
    ds = DeformUserhandleDataset(
        cfg, "identity_unseen", "test_unseen_identities", load_mesh=True
    )
    assert len(ds) == 2  # one editing pair per model
    item = ds[0]
    # vertices double as surface samples; handle mask marks the moved region
    assert item["surface_samples_inputs"].shape[1] == 7
    mask = item["cano_handle_sample_idx"][:, 0].astype(bool)
    assert mask.any() and not mask.all()
    moved = item["surface_samples_tgt"] - item["surface_samples_src"]
    # only masked region moves; head moves by exactly the configured delta
    head = np.abs(moved).sum(-1) > 1e-8
    assert (head <= mask).all()
    np.testing.assert_allclose(
        moved[head],
        np.tile([-0.15, -0.2, -0.2], (int(head.sum()), 1)),
        atol=1e-6,
    )
    assert item["verts_src"].shape == item["verts_tgt"].shape
    assert item["faces"].shape[1] == 3
