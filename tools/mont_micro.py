"""Cost of one pallas mont_mul (VMEM-resident, differenced amplification)."""
import sys, time
sys.path.insert(0, ".")
from zklaim_tpu.utils.jaxconfig import setup_cache
setup_cache()
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from zklaim_tpu.ff import pallas_field as PF

key = jax.random.PRNGKey(0)
LANES = 1024

def build(K):
    def kernel(p_ref, np_ref, x_ref, o_ref):
        p, npv = p_ref[:], np_ref[:]
        v = x_ref[:]
        def body(i, v):
            return PF.mont_mul(v, v, p, npv)
        o_ref[:] = jax.lax.fori_loop(0, K, body, v)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, LANES), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

def sample(g, *a):
    np.asarray(g(*a).ravel()[:8])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(g(*a).ravel()[:8])
        best = min(best, time.perf_counter() - t0)
    return best

p = jnp.asarray(PF.FQ_P); npc = jnp.asarray(PF.FQ_NP)
x = jax.random.randint(key, (16, LANES), 0, 1 << 16, dtype=jnp.int32).astype(jnp.uint32)
K1, K2 = 64, 512
t1 = sample(jax.jit(build(K1)), p, npc, x)
t2 = sample(jax.jit(build(K2)), p, npc, x)
dt = (t2 - t1) / (K2 - K1)
print(f"t1={t1*1e3:.1f}ms t2={t2*1e3:.1f}ms  mont_mul: {dt*1e6:.2f} us per (16,{LANES}) block"
      f" = {dt/LANES*1e9:.1f} ns/lane  ({LANES/dt/1e6:.1f} M muls/s)", flush=True)
