import sys, time
import jax, jax.numpy as jnp
import numpy as np
from vanderbei_tpu.ops.pallas_kernels import scaled_syrk, scaled_syrk_reference

rng = np.random.default_rng(0)

def check(m, n, batch=None):
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    s = jnp.asarray(rng.uniform(0.5, 2, n), jnp.float32)
    e = jnp.asarray(rng.uniform(0.5, 2, m), jnp.float32)
    t0 = time.perf_counter()
    if batch:
        Ab = jnp.broadcast_to(A, (batch, m, n)) + 0.0
        sb = jnp.broadcast_to(s, (batch, n)) + 0.0
        eb = jnp.broadcast_to(e, (batch, m)) + 0.0
        out = jax.jit(jax.vmap(scaled_syrk))(Ab, sb, eb)
    else:
        out = jax.jit(scaled_syrk)(A, s, e)
    jax.block_until_ready(out)
    ref = scaled_syrk_reference(np.asarray(A, np.float64), np.asarray(s, np.float64), np.asarray(e, np.float64))
    got = np.asarray(out[0] if batch else out)
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1)
    print(f"syrk m={m} n={n} batch={batch}: ok err={err:.1e} {time.perf_counter()-t0:.1f}s", flush=True)

for args in [(512, 512, None), (1024, 1024, None), (1024, 1024, 4),
             (2048, 2048, None), (4096, 4096, None), (6144, 6144, None)]:
    check(*args)
