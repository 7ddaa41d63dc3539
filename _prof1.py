import time, numpy as np, jax, jax.numpy as jnp
from nsdp_tpu.ops import furthest_point_sample, knn
from nsdp_tpu.models import build_deformation_network
from __graft_entry__ import FLAGSHIP_CONFIG

def timeit(f, *a, n=5):
    r = f(*a); jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); r = f(*a); jax.block_until_ready(r)
        ts.append(time.perf_counter()-t0)
    return np.median(ts)*1e3

rng = np.random.RandomState(0)
xyz = jnp.asarray(rng.randn(1, 5000, 3), jnp.float32)

fps_j = jax.jit(lambda x: furthest_point_sample(x, 500))
print("FPS 5000->500: %.2f ms" % timeit(fps_j, xyz))
fps2_j = jax.jit(lambda x: furthest_point_sample(x, 100))
xyz500 = jnp.asarray(rng.randn(1, 500, 3), jnp.float32)
print("FPS 500->100: %.2f ms" % timeit(fps2_j, xyz500))

knn_j = jax.jit(lambda a, b: knn(a, b, 10))
print("kNN 5000x5000 k10: %.2f ms" % timeit(knn_j, xyz, xyz))

# encoder alone (forward-net encoder, 7ch inputs)
enc_net = build_deformation_network(FLAGSHIP_CONFIG, no_input_corr=False)
inputs = jnp.asarray(rng.randn(1, 5000, 7), jnp.float32)
enc_vars = enc_net.encoder.init(jax.random.PRNGKey(0), inputs, train=False)
enc_j = jax.jit(lambda v, x: enc_net.encoder.apply(v, x, train=False))
print("Encoder 5000pts: %.2f ms" % timeit(enc_j, enc_vars, inputs))

# decoder alone at Q=65536
Q = 65536
enc_out = enc_j(enc_vars, inputs)
dec_vars = enc_net.decoder.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 3)), enc_out)
q = jnp.asarray(rng.randn(1, Q, 3), jnp.float32)
dec_j = jax.jit(lambda v, p, e: enc_net.decoder.apply(v, p, e, train=False))
print("Decoder Q=65536: %.2f ms" % timeit(dec_j, dec_vars, q, enc_out))
