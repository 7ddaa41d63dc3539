import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import numpy as np, jax.numpy as jnp
from nsdp_tpu.ops import knn
from nsdp_tpu.ops.knn_pallas import knn_pallas

rng = np.random.RandomState(0)
for B, Nq, M, k in [(2, 300, 257, 7), (1, 1000, 1000, 16), (1, 129, 64, 10)]:
    q = jnp.asarray(rng.randn(B, Nq, 3).astype(np.float32))
    p = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
    ref = np.asarray(knn(q, p, k))
    got = np.asarray(knn_pallas(q, p, k, tile=128, interpret=True))
    print(f"B={B} Nq={Nq} M={M} k={k}: idx match {(ref==got).mean():.4f}")
    refd = np.asarray(knn(q, p, k, return_dist=True)[1])
    goti, gotd = knn_pallas(q, p, k, tile=128, return_dist=True, interpret=True)
    print("  dist close:", np.allclose(np.asarray(gotd), refd, rtol=1e-4, atol=1e-5))
