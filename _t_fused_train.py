import time, numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import FLAGSHIP_CONFIG, _example_batch
from nsdp_tpu.models import build_model
from nsdp_tpu.training import create_train_state, make_steps, optimizer_factory

for fused in (False, True):
    cfg = {"model": dict(FLAGSHIP_CONFIG["model"], type="forward", fused_attention=fused),
           "training": {"optimizer": "Adam", "lr": 5e-4}}
    model = build_model(cfg)
    _, tx = optimizer_factory(cfg["training"])
    steps = make_steps(model, "forward", tx)
    batch = _example_batch(B=16, N=5000, Q=5000)
    example = (jnp.asarray(batch["space_samples_src"]), jnp.asarray(batch["surface_samples_inputs"]))
    state = create_train_state(model, jax.random.PRNGKey(0), example, tx)
    state, loss = steps["train_step"](state, batch, 5e-4); float(loss)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        state, loss = steps["train_step"](state, batch, 5e-4)
        float(loss)
        ts.append(time.perf_counter()-t0)
    per = np.median(ts)
    print("fused=%s: step %.1f ms (incl RT), loss %.4f" % (fused, per*1e3, float(loss)), flush=True)
