import time, numpy as np, jax, jax.numpy as jnp
from nsdp_tpu.ops import furthest_point_sample
from nsdp_tpu.ops.fps_pallas import furthest_point_sample_pallas

def sync_time(f, *a, n=3):
    float(jnp.sum(f(*a)))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); float(jnp.sum(f(*a))); ts.append(time.perf_counter()-t0)
    return np.median(ts)*1e3

rng = np.random.RandomState(0)
xyz = jnp.asarray(rng.randn(1, 5000, 3).astype(np.float32) + 0.5)
ref = np.asarray(furthest_point_sample(xyz, 500))
got = np.asarray(furthest_point_sample_pallas(xyz, 500))
print("TPU match:", (ref == got).mean(), flush=True)

@jax.jit
def chain_old(x, k):
    def body(i, c):
        return c + jnp.sum(furthest_point_sample(x + c*0.0, 500))
    return jax.lax.fori_loop(0, k, body, jnp.int32(0))
@jax.jit
def chain_new(x, k):
    def body(i, c):
        return c + jnp.sum(furthest_point_sample_pallas(x + c.astype(jnp.float32)*0.0, 500))
    return jax.lax.fori_loop(0, k, body, jnp.int32(0))

for name, f in [("xla", chain_old), ("pallas", chain_new)]:
    t1 = sync_time(f, xyz, 1); t2 = sync_time(f, xyz, 11)
    print("%s FPS 5000->500: %.3f ms" % (name, (t2-t1)/10), flush=True)
