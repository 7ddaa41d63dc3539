"""Sequence-level preprocessing drivers with process fan-out.

Pure-Python equivalents of the reference driver scripts
(``preprocess/generate_dataset_*_{seq,surfaceflow,spaceflow}.py`` and
``generate_dataset_nocorr.py``), sharing one fan-out helper.  The shell
entry points become the CLI in :mod:`nsdp_tpu.preprocess.__main__`:

  python -m nsdp_tpu.preprocess deform4d       --input_mesh_dir ... --output_data_dir ...
  python -m nsdp_tpu.preprocess deformtransfer --input_mesh_dir ... --output_data_dir ...
  python -m nsdp_tpu.preprocess nocorr         --input_mesh_dir ... --output_data_dir ...
  python -m nsdp_tpu.preprocess anime          --in_folder ...      --mesh_folder ...
"""

import os
from typing import Callable, Dict, List, Optional

import numpy as np
from joblib import Parallel, delayed

from nsdp_tpu.preprocess.anime import convert_anime_to_meshes
from nsdp_tpu.preprocess.flow import (
    make_template_sample_info,
    write_space_flow,
    write_surface_flow,
)
from nsdp_tpu.preprocess.normalize import normalize_mesh_directory


def _read_list(path: Optional[str]) -> Optional[List[str]]:
    if path is None:
        return None
    with open(path, "r") as f:
        return [ln.strip() for ln in f if ln.strip()]


def _sequence_dirs(mesh_directory: str, filter_lst: Optional[str]) -> List[str]:
    selected = _read_list(filter_lst)
    out = []
    for name in sorted(os.listdir(mesh_directory)):
        if not os.path.isdir(os.path.join(mesh_directory, name)):
            continue
        if selected is not None and name not in selected:
            continue
        out.append(name)
    return out


def convert_anime_folder(
    in_folder: str, mesh_folder: str, out_ext: str = "obj", n_jobs: int = -1
) -> int:
    """Convert every ``<in_folder>/<model>/*.anime`` to per-frame meshes."""
    jobs = []
    for model in sorted(os.listdir(in_folder)):
        model_dir = os.path.join(in_folder, model)
        if not os.path.isdir(model_dir):
            continue
        for fname in sorted(os.listdir(model_dir)):
            if fname.endswith(".anime"):
                stem = os.path.splitext(fname)[0]
                jobs.append(
                    (os.path.join(model_dir, fname),
                     os.path.join(mesh_folder, stem))
                )
    Parallel(n_jobs=n_jobs)(
        delayed(convert_anime_to_meshes)(src, dst, out_ext) for src, dst in jobs
    )
    return len(jobs)


def generate_sequences(
    mesh_directory: str,
    dataset_directory: str,
    mesh_format: str = "obj",
    interval: int = 3,
    filter_lst: Optional[str] = None,
    skip_existing: bool = True,
    n_jobs: int = -1,
    make_watertight: bool = False,
    watertight_spacing: float = 0.005,
    watertight_method: str = "sdf",
    watertight_depth: int = 8,
) -> int:
    """Normalise every ``interval``-th frame of every sequence (stage 'seq').

    ``make_watertight`` runs a closed-manifold remesh before normalisation
    (off by default, like the reference's ``process_mesh_local.sh:22``).
    ``watertight_method='sdf'`` is the msh2df-equivalent SDF rasterisation;
    ``watertight_spacing`` is its grid resolution (reference flag
    ``-spacing 0.005``; cost scales with (extent/spacing)^3 — the numpy
    implementation wants ~0.02-0.05 on unit-scale meshes where GAPS's C++
    used 0.005).  ``watertight_method='poisson'`` is the reference's active
    meshlab screened-Poisson recipe (``make_watertight.sh:19``) with
    ``watertight_depth`` as the .mlx octree depth."""
    seqs = _sequence_dirs(mesh_directory, filter_lst)
    os.makedirs(dataset_directory, exist_ok=True)
    counts = Parallel(n_jobs=n_jobs)(
        delayed(normalize_mesh_directory)(
            os.path.join(mesh_directory, seq),
            os.path.join(dataset_directory, seq),
            mesh_format,
            interval,
            skip_existing,
            make_watertight=make_watertight,
            watertight_spacing=watertight_spacing,
            watertight_method=watertight_method,
            watertight_depth=watertight_depth,
        )
        for seq in seqs
    )
    return int(sum(counts))


def generate_flows(
    mesh_directory: str,
    dataset_directory: str,
    temp_lst: str,
    mesh_format: str = "obj",
    interval: int = 3,
    surface_count: int = 100000,
    space_count: int = 200000,
    skip_existing: bool = True,
    n_jobs: int = -1,
    seed: Optional[int] = None,
    template_frame: str = "0000",
) -> int:
    """Write surface_points.npz + flow.npz for every processed frame.

    One sample-info draw per identity template (``temp_lst`` names the
    template sequences; identity = name before the first '_'), replayed on
    every frame of every sequence of that identity.
    """
    rng = np.random.RandomState(seed) if seed is not None else np.random
    sample_info: Dict[str, Dict] = {}
    for seq in _read_list(temp_lst) or []:
        identity = seq.split("_")[0]
        template_path = os.path.join(
            mesh_directory, seq, f"{template_frame}.{mesh_format}"
        )
        if not os.path.exists(template_path):
            print(f"template mesh missing: {template_path}")
            continue
        sample_info[identity] = make_template_sample_info(
            template_path, surface_count, space_count, rng=rng
        )

    jobs = []
    for seq in _sequence_dirs(mesh_directory, None):
        identity = seq.split("_")[0]
        if identity not in sample_info:
            print(f"{seq} is not in the selected templates")
            continue
        frames = sorted(
            f
            for f in os.listdir(os.path.join(mesh_directory, seq))
            if f.endswith("." + mesh_format)
        )
        frames = [frames[i] for i in range(len(frames)) if i % interval == 0]
        for fname in frames:
            stem = os.path.splitext(fname)[0]
            frame_dir = os.path.join(dataset_directory, seq, stem)
            if not os.path.isfile(os.path.join(frame_dir, "orig_to_gaps.txt")):
                continue  # frame was not normalised (stage 'seq' skipped it)
            if skip_existing and os.path.isfile(
                os.path.join(frame_dir, "surface_points.npz")
            ) and os.path.isfile(os.path.join(frame_dir, "flow.npz")):
                continue
            jobs.append(
                (os.path.join(mesh_directory, seq, fname), frame_dir, identity)
            )

    def one(mesh_path, frame_dir, identity):
        info = sample_info[identity]
        write_surface_flow(mesh_path, frame_dir, info)
        write_space_flow(mesh_path, frame_dir, info)

    Parallel(n_jobs=n_jobs)(delayed(one)(*job) for job in jobs)
    return len(jobs)


def generate_nocorr(
    mesh_directory: str,
    dataset_directory: str,
    mesh_format: str = "off",
    filter_lst: Optional[str] = None,
    skip_existing: bool = True,
    n_jobs: int = -1,
) -> int:
    """Normalisation-only datasets (TOSCA / dogrec): each mesh file of each
    model directory becomes ``<dataset>/<model>/<idx:04d>/`` with
    ``orig_to_gaps.txt`` + ``mesh_orig`` + ``model_normalized.obj``."""
    from nsdp_tpu.preprocess.normalize import normalize_mesh_file

    jobs = []
    for model in _sequence_dirs(mesh_directory, filter_lst):
        model_dir = os.path.join(mesh_directory, model)
        files = sorted(
            f for f in os.listdir(model_dir) if f.endswith("." + mesh_format)
        )
        for idx, fname in enumerate(files):
            out_dir = os.path.join(dataset_directory, model, f"{idx:04d}")
            if skip_existing and os.path.isfile(
                os.path.join(out_dir, "orig_to_gaps.txt")
            ):
                continue
            jobs.append((os.path.join(model_dir, fname), out_dir))

    Parallel(n_jobs=n_jobs)(
        delayed(normalize_mesh_file)(src, dst) for src, dst in jobs
    )
    return len(jobs)
