import time, numpy as np, jax, jax.numpy as jnp

def sync_time(f, *a, n=3):
    """Median wall time of f(*a) synchronized by a scalar fetch."""
    float(f(*a))  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); float(f(*a)); ts.append(time.perf_counter()-t0)
    return np.median(ts)

# fixed round-trip cost
rt = sync_time(jax.jit(lambda: jnp.float32(1.0)))
print("fixed RT: %.2f ms" % (rt*1e3), flush=True)

a = jnp.ones((4096, 4096), jnp.bfloat16)
@jax.jit
def chain_mm(a, k):
    def body(i, x):
        return x @ a * (1.0/4096.0)
    return jnp.sum(jax.lax.fori_loop(0, k, body, a))
t1 = sync_time(chain_mm, a, 1)
t2 = sync_time(chain_mm, a, 21)
per = (t2-t1)/20
print("per 4096^3 bf16 mm: %.3f ms -> %.1f TFLOP/s" % (per*1e3, 2*4096**3/per/1e12), flush=True)

# full flagship deform pipeline, chained
from __graft_entry__ import FLAGSHIP_CONFIG, _example_batch
from nsdp_tpu.models import build_model
Q = 65536
model = build_model(FLAGSHIP_CONFIG)
batch = _example_batch(B=1, N=5000, Q=Q)
inputs = jnp.asarray(batch["surface_samples_inputs"])
space = jnp.asarray(batch["space_samples_src"])
ss, st, m = inputs[..., 0:3], inputs[..., 3:6], inputs[..., 6:7]
variables = model.init(jax.random.PRNGKey(0), space[:, :128], ss, st, m, train=False)

@jax.jit
def chain_deform(space, k):
    def body(i, x):
        return model.apply(variables, x, ss, st, m, train=False)
    return jnp.sum(jax.lax.fori_loop(0, k, body, space))

t1 = sync_time(chain_deform, space, 1)
t2 = sync_time(chain_deform, space, 6)
per = (t2-t1)/5
print("per deform call (Q=%d): %.2f ms -> %.0f qps" % (Q, per*1e3, Q/per), flush=True)
