import time, numpy as np, jax, jax.numpy as jnp

x = jnp.ones((8, 128))
f = jax.jit(lambda x: x * 2)
r = f(x); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(20):
    r = f(x)
jax.block_until_ready(r)
print("async chain of 20 tiny calls: %.2f ms total" % ((time.perf_counter()-t0)*1e3))

t0 = time.perf_counter()
for _ in range(20):
    r = f(x); jax.block_until_ready(r)
print("sync 20 tiny calls: %.2f ms total (%.2f ms each RT)" % ((time.perf_counter()-t0)*1e3, (time.perf_counter()-t0)*1e3/20))

# big matmul to sanity-check real compute measurement
a = jnp.ones((8192, 8192), jnp.bfloat16)
mm = jax.jit(lambda a: a @ a)
r = mm(a); jax.block_until_ready(r)
ts = []
for _ in range(5):
    t0 = time.perf_counter(); r = mm(a); jax.block_until_ready(r); ts.append(time.perf_counter()-t0)
dt = float(np.median(ts))
print("8192^3 bf16 matmul: %.2f ms -> %.1f TFLOP/s" % (dt*1e3, 2*8192**3/dt/1e12))
