import time, numpy as np, jax, jax.numpy as jnp

def sync_time(f, *a, n=3):
    float(f(*a))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); float(f(*a)); ts.append(time.perf_counter()-t0)
    return np.median(ts)

from __graft_entry__ import FLAGSHIP_CONFIG, _example_batch
from nsdp_tpu.models import build_model, build_deformation_network
Q = 65536
batch = _example_batch(B=1, N=5000, Q=Q)
inputs = jnp.asarray(batch["surface_samples_inputs"])
space = jnp.asarray(batch["space_samples_src"])
ss, st, m = inputs[..., 0:3], inputs[..., 3:6], inputs[..., 6:7]

for dtype, name in [(None, "f32"), (jnp.bfloat16, "bf16")]:
    model = build_model(FLAGSHIP_CONFIG, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), space[:, :128], ss, st, m, train=False)
    @jax.jit
    def chain_deform(space, k):
        def body(i, x):
            return model.apply(variables, x.astype(jnp.float32), ss, st, m, train=False).astype(jnp.float32)
        return jnp.sum(jax.lax.fori_loop(0, k, body, space))
    t1 = sync_time(chain_deform, space, 1)
    t2 = sync_time(chain_deform, space, 6)
    per = (t2-t1)/5
    print("%s: per deform %.2f ms -> %.0f qps" % (name, per*1e3, Q/per), flush=True)

    # encoder alone (3 encoder passes happen per deform; measure 1)
    net = build_deformation_network(FLAGSHIP_CONFIG, no_input_corr=False, dtype=dtype)
    enc_vars = net.encoder.init(jax.random.PRNGKey(0), inputs, train=False)
    @jax.jit
    def chain_enc(x, k):
        def body(i, c):
            e = net.encoder.apply(enc_vars, x + c*0.0, train=False)
            return jnp.sum(e["z"]).astype(jnp.float32)
        return jax.lax.fori_loop(0, k, lambda i, c: body(i, c), 0.0)
    t1 = sync_time(chain_enc, inputs, 1)
    t2 = sync_time(chain_enc, inputs, 6)
    print("%s: per encoder %.2f ms" % (name, (t2-t1)/5*1e3), flush=True)

    # decoder alone at Q
    enc_out = jax.jit(lambda v, x: net.encoder.apply(v, x, train=False))(enc_vars, inputs)
    dec_vars = net.decoder.init(jax.random.PRNGKey(0), jnp.zeros((1,128,3)), enc_out)
    @jax.jit
    def chain_dec(q, k):
        def body(i, x):
            return net.decoder.apply(dec_vars, x, enc_out, train=False).astype(jnp.float32)
        return jnp.sum(jax.lax.fori_loop(0, k, body, q))
    t1 = sync_time(chain_dec, space, 1)
    t2 = sync_time(chain_dec, space, 6)
    print("%s: per decoder(Q=%d) %.2f ms" % (name, Q, (t2-t1)/5*1e3), flush=True)
