"""NSDP-TPU: a TPU-native framework for Neural Shape Deformation Priors.

A ground-up JAX/XLA/Pallas re-design of the capabilities of tangjiapeng/NSDP
(Neural Shape Deformation Priors, NeurIPS 2022): learned deformation fields for
non-rigid 3D shape manipulation, factored through a canonical pose
(source -> canonical -> target), with a Point Transformer encoder and a
cross-attention neural-field decoder.

Layout (mirrors the reference's capability inventory, re-architected TPU-first):

- ``nsdp_tpu.ops``       geometry primitives (FPS, kNN, gather, ball query,
                         three-NN interpolation) as pure-JAX/Pallas kernels;
                         replaces the reference's CUDA ``pointnet2_ops_lib``.
- ``nsdp_tpu.nn``        vector-attention building blocks (flax.linen).
- ``nsdp_tpu.models``    encoders / decoders / deformation networks / the
                         two-stage arbitrary-pose flow composition.
- ``nsdp_tpu.training``  optimizers, LR schedules, jitted train/eval steps,
                         checkpoint naming contract of the reference.
- ``nsdp_tpu.parallel``  device mesh, sharding rules (dp over batch, sp over
                         the query-point axis), multi-host init helpers.
- ``nsdp_tpu.data``      host-side dataset pipeline with the reference's
                         directory contract (orig_to_gaps.txt,
                         surface_points.npz, flow.npz, mesh_orig.obj).
- ``nsdp_tpu.utils``     config, logging, metrics, mesh IO, generation.
- ``nsdp_tpu.preprocess`` offline dataset production (.anime reader, PCA
                         normalization replacing GAPS msh2msh, flow sampling).
- ``nsdp_tpu.native``    C++ runtime components (marching cubes, exact
                         KD-tree chamfer) with ctypes bindings.
"""

__version__ = "0.1.0"
