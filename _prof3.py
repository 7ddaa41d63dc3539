import time, numpy as np, jax, jax.numpy as jnp

def timeit(f, *a, n=5):
    np.asarray(jax.tree.leaves(f(*a))[0])  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f(*a)
        np.asarray(jax.tree.leaves(r)[0])  # forces completion + transfer
        ts.append(time.perf_counter()-t0)
    return np.median(ts)*1e3

a = jnp.ones((8192, 8192), jnp.bfloat16)
mm = jax.jit(lambda a: (a @ a)[:1, :1])
dt = timeit(mm, a)
print("8192^3 bf16 matmul: %.2f ms -> %.1f TFLOP/s" % (dt, 2*8192**3/(dt/1e3)/1e12))

small = jnp.ones((8,))
f0 = jax.jit(lambda x: x + 1)
print("tiny RT: %.2f ms" % timeit(f0, small))

from nsdp_tpu.ops import furthest_point_sample, knn
rng = np.random.RandomState(0)
xyz = jnp.asarray(rng.randn(1, 5000, 3), jnp.float32)
fps_j = jax.jit(lambda x: furthest_point_sample(x, 500))
print("FPS 5000->500: %.2f ms" % timeit(fps_j, xyz))
knn_j = jax.jit(lambda a, b: knn(a, b, 10))
print("kNN 5000x5000 k10: %.2f ms" % timeit(knn_j, xyz, xyz))

from nsdp_tpu.models import build_deformation_network
from __graft_entry__ import FLAGSHIP_CONFIG
enc_net = build_deformation_network(FLAGSHIP_CONFIG, no_input_corr=False)
inputs = jnp.asarray(rng.randn(1, 5000, 7), jnp.float32)
enc_vars = enc_net.encoder.init(jax.random.PRNGKey(0), inputs, train=False)
enc_j = jax.jit(lambda v, x: enc_net.encoder.apply(v, x, train=False)["z"])
print("Encoder 5000pts: %.2f ms" % timeit(enc_j, enc_vars, inputs))

Q = 65536
enc_out = jax.jit(lambda v, x: enc_net.encoder.apply(v, x, train=False))(enc_vars, inputs)
dec_vars = enc_net.decoder.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 3)), enc_out)
q = jnp.asarray(rng.randn(1, Q, 3), jnp.float32)
dec_j = jax.jit(lambda v, p, e: enc_net.decoder.apply(v, p, e, train=False))
print("Decoder Q=65536: %.2f ms" % timeit(dec_j, dec_vars, q, enc_out))
