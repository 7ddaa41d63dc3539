#!/usr/bin/env python
"""Interactive editing with DeformationService + edit sessions.

Builds a tiny arbitrary-pose model on synthetic data, opens an editing
session over a fixed source shape, and performs several handle drags —
each drag re-runs only the forward half of the composition (the
canonicalisation is precomputed once per session; see
docs/PERFORMANCE.md "Interactive editing sessions").

Runs anywhere: on TPU the fused Pallas path is used automatically; on CPU
pass --interpret (Pallas interpreter mode) or let it fall back to flax.

  python examples/serve_interactive.py [--workdir /tmp/nsdp_serve]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/nsdp_serve")
    parser.add_argument("--interpret", action="store_true",
                        help="Pallas interpreter mode (CPU)")
    parser.add_argument("--n_drags", type=int, default=4)
    args = parser.parse_args()

    from nsdp_tpu.data.synthetic import (
        generate_synthetic_dataset,
        synthetic_config,
    )
    from nsdp_tpu.serving import DeformationService

    print("== generating synthetic shapes ==")
    fixture = generate_synthetic_dataset(
        os.path.join(args.workdir, "data"),
        n_identities=1, n_motions_per_identity=1, n_frames=2,
        n_surface=256, n_space=256,
    )
    cfg = synthetic_config(fixture, model_type="arbitrary", arbitrary=True,
                           n_surface=256, n_space=256)
    cfg["model"]["fused_attention"] = True

    # Fresh (untrained) weights: the demo shows the serving mechanics;
    # point test.weight_file at a trained checkpoint for real edits.
    # use_fused: forced on with --interpret (Pallas interpreter on CPU),
    # otherwise auto — fused on TPU, flax fallback on CPU.
    print("== building service ==")
    svc = DeformationService(
        cfg, buckets=(512,),
        use_fused=True if args.interpret else None,
        interpret=args.interpret or None,
    )

    rng = np.random.RandomState(0)
    surf = rng.randn(256, 3).astype(np.float32) * 0.2
    verts = rng.randn(400, 3).astype(np.float32) * 0.2  # "mesh vertices"

    print("== opening edit session (canonicalise once) ==")
    t0 = time.perf_counter()
    session = svc.edit_session(verts, surf)
    print(f"   session ready in {time.perf_counter() - t0:.2f}s")

    # drag the 'head' region (y above median) upward in increments
    handle = (surf[:, 1] > np.median(surf[:, 1])).astype(np.float32)
    for i in range(args.n_drags):
        target = surf.copy()
        target[:, 1] += 0.05 * (i + 1)  # incremental upward drag
        t0 = time.perf_counter()
        deformed = session.drag(target * handle[:, None], handle)
        dt = time.perf_counter() - t0
        print(
            f"   drag {i + 1}: {deformed.shape[0]} verts deformed in "
            f"{dt * 1e3:.1f} ms (wall, incl. host transfer); "
            f"mean |dv| = {np.abs(deformed - verts).mean():.4f}"
        )

    print("== full evaluation of the last drag for comparison ==")
    mask = handle[:, None]
    inputs = np.concatenate([surf, target * mask, mask], axis=1)
    t0 = time.perf_counter()
    out = svc.deform(verts, inputs)
    print(
        f"   full deform: {time.perf_counter() - t0:.2f}s wall; "
        f"max |session - full| = {np.abs(out - deformed).max():.2e}"
    )


if __name__ == "__main__":
    main()
