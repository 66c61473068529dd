import sys, time
sys.path.insert(0, ".")
from zklaim_tpu.utils.jaxconfig import setup_cache
setup_cache()
import numpy as np
import jax, jax.numpy as jnp
from zklaim_tpu.ec import jaxcurve as JC
from zklaim_tpu.ec import pallas_curve as PC

f = JC.FQ_OPS
key = jax.random.PRNGKey(0)
def rand_fq(shape):
    return jax.random.randint(key, shape + (16,), 0, 1 << 16, dtype=jnp.int32).astype(jnp.uint32)

def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best*1e3:9.2f} ms", flush=True)

for logn in (15, 17):
    n = 1 << logn
    p = (rand_fq((n,)), rand_fq((n,)), rand_fq((n,)))
    ja = jax.jit(JC.point_add, static_argnums=0)
    timeit(f"XLA point_add (2^{logn},) AoS", lambda a: ja(f, a, a), p)
    timeit(f"Pallas point_add (2^{logn},)", lambda a: PC.point_add(f, a, a), p)
    # SoA direct (skip transpose wrappers)
    soa = tuple(jnp.swapaxes(c, 0, 1) for c in p)
    timeit(f"Pallas _padd_soa (2^{logn},)", lambda a: PC._padd_soa(1, n, *a, *a), soa)
