"""True in-kernel RCB16 point_add cost (VMEM-resident, differenced)."""
import sys, time
sys.path.insert(0, ".")
from zklaim_tpu.utils.jaxconfig import setup_cache
setup_cache()
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from zklaim_tpu.ff import pallas_field as PF
from zklaim_tpu.ec import pallas_curve as PC

key = jax.random.PRNGKey(0)
LANES = 1024

def build(K):
    def kernel(p_ref, np_ref, x_ref, y_ref, z_ref, xo, yo, zo):
        f = PC._Fq(p_ref[:], np_ref[:])
        pt = (x_ref[:], y_ref[:], z_ref[:])
        def body(i, pt):
            return PC._rcb_add(f, pt, pt)
        r = jax.lax.fori_loop(0, K, body, pt)
        xo[:], yo[:], zo[:] = r
    return pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((16, LANES), jnp.uint32) for _ in range(3)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
    )

def sample(g, *a):
    np.asarray(g(*a)[0].ravel()[:8])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(g(*a)[0].ravel()[:8])
        best = min(best, time.perf_counter() - t0)
    return best

p = jnp.asarray(PF.FQ_P); npc = jnp.asarray(PF.FQ_NP)
coords = [jax.random.randint(key, (16, LANES), 0, 1 << 16, dtype=jnp.int32).astype(jnp.uint32) for _ in range(3)]
K1, K2 = 16, 128
t1 = sample(jax.jit(build(K1)), p, npc, *coords)
t2 = sample(jax.jit(build(K2)), p, npc, *coords)
dt = (t2 - t1) / (K2 - K1)
print(f"t1={t1*1e3:.1f}ms t2={t2*1e3:.1f}ms  point_add: {dt*1e6:.2f} us per (,{LANES}) block"
      f" = {dt/LANES*1e9:.1f} ns/lane  ({LANES/dt/1e6:.2f} M adds/s)", flush=True)
