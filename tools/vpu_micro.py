"""VPU primitive throughput with work amplified via fori_loop (RPC-proof)."""
import sys, time
sys.path.insert(0, ".")
from zklaim_tpu.utils.jaxconfig import setup_cache
setup_cache()
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

key = jax.random.PRNGKey(0)
N = 1 << 20
REPS = 512
a32 = jax.random.randint(key, (N,), 1, 1 << 16, dtype=jnp.int32).astype(jnp.uint32)
af = a32.astype(jnp.float32)

def timeit(name, fn, x, inner=1):
    g = jax.jit(fn)
    np.asarray(g(x).ravel()[:8])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(g(x).ravel()[:8])
        best = min(best, time.perf_counter() - t0)
    ops = N * REPS * inner
    print(f"{name:30s} {best*1e3:8.2f} ms  {ops/best/1e9:8.1f} Gops/s", flush=True)

def loop(body):
    return lambda x: lax.fori_loop(0, REPS, lambda i, v: body(v, i), x)

timeit("u32 mul", loop(lambda v, i: v * (v | jnp.uint32(1))), a32, inner=1)
timeit("u32 add", loop(lambda v, i: v + (v ^ jnp.uint32(i))), a32, inner=1)
timeit("u32 shr+and", loop(lambda v, i: (v >> 3) & jnp.uint32(0xFFFF)), a32, inner=2)
timeit("f32 fma", loop(lambda v, i: v * 1.0000001 + 0.5), af, inner=1)
# mult on values < 2^16 (both operands masked)
timeit("u32 mul lo16", loop(lambda v, i: ((v & jnp.uint32(0xFFFF)) * jnp.uint32(3)) & jnp.uint32(0x7FFFFFFF)), a32, inner=1)
# i32 vs u32
ai = a32.astype(jnp.int32)
timeit("i32 mul", loop(lambda v, i: v * (v | jnp.int32(1))), ai, inner=1)
