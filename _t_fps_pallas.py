import os
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from nsdp_tpu.ops import furthest_point_sample
from nsdp_tpu.ops.fps_pallas import furthest_point_sample_pallas

rng = np.random.RandomState(0)
for B, N, npoint in [(2, 100, 16), (1, 5000, 500), (3, 333, 50)]:
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) + 0.5)
    ref = np.asarray(furthest_point_sample(xyz, npoint))
    got = np.asarray(furthest_point_sample_pallas(xyz, npoint, interpret=True))
    match = (ref == got).mean()
    print(f"B={B} N={N} np={npoint}: match {match:.3f}")
    if match < 1.0:
        bad = np.argwhere(ref != got)[:5]
        print("  first mismatches", bad, ref[tuple(bad[0])], got[tuple(bad[0])])
