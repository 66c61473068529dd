"""Microbenchmark MSM building blocks on the default device (honest sync)."""
import sys, time
sys.path.insert(0, ".")
from zklaim_tpu.utils.jaxconfig import setup_cache
setup_cache()
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from zklaim_tpu.ec import jaxcurve as JC

W, N = 32, 1 << 12
f = JC.FQ_OPS

key = jax.random.PRNGKey(0)
def rand_fq(shape):
    return jax.random.randint(key, shape + (16,), 0, 1 << 16, dtype=jnp.int32).astype(jnp.uint32)

pts2 = (rand_fq((W, N)), rand_fq((W, N)), rand_fq((W, N)))
keys = jax.random.randint(key, (W, N), 0, 128, dtype=jnp.int32)
skeys = jnp.sort(keys, axis=1)

def timeit(name, fn, *args):
    g = jax.jit(fn)
    out = g(*args)
    np.asarray(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = g(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best*1e3:9.2f} ms", flush=True)

# one full-width point add at (W, N)
timeit("point_add (W,N)", lambda p: JC.point_add(f, p, p), pts2)

# 12 rounds of add via fori_loop (no roll/select)
def adds12(p):
    return lax.fori_loop(0, 12, lambda i, q: JC.point_add(f, q, q), p)
timeit("12x point_add fori (W,N)", adds12, pts2)

# prefix scan rounds: roll + add + select
def prefix(p):
    idx = jnp.arange(N)[None, :]
    def body(t, q):
        d = jnp.int32(1) << t
        sh = jax.tree.map(lambda a: jnp.roll(a, d, axis=1), q)
        return JC.point_select(f, idx >= d, JC.point_add(f, q, sh), q)
    return lax.fori_loop(0, 12, body, p)
timeit("12x roll+add+select (W,N)", prefix, pts2)

# roll alone x12
def rolls(p):
    def body(t, q):
        d = jnp.int32(1) << t
        return jax.tree.map(lambda a: jnp.roll(a, d, axis=1), q)
    return lax.fori_loop(0, 12, body, p)
timeit("12x roll fori (W,N)", rolls, pts2)

# static roll x12
def rolls_static(p):
    for t in range(12):
        p = jax.tree.map(lambda a: jnp.roll(a, 1 << t, axis=1), p)
    return p
timeit("12x roll static (W,N)", rolls_static, pts2)

# sort + take_along_axis gather
def sort_taa(k, p):
    o0 = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (W, N))
    kk, order = lax.sort_key_val(k, o0)
    take = lambda a: jnp.take_along_axis(a, order[..., None], axis=1)
    return jax.tree.map(take, p)
timeit("sort + take_along_axis (W,N)", sort_taa, keys, pts2)

# sort + flat take gather
def sort_flat(k, p):
    o0 = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (W, N))
    kk, order = lax.sort_key_val(k, o0)
    flat_idx = (order + jnp.arange(W, dtype=jnp.int32)[:, None] * N).reshape(-1)
    take = lambda a: jnp.take(a.reshape((W * N,) + a.shape[2:]), flat_idx, axis=0).reshape(a.shape)
    return jax.tree.map(take, p)
timeit("sort + flat take (W,N)", sort_flat, keys, pts2)

# searchsorted vmapped
def ss(k):
    bv = jnp.arange(0, 129, dtype=jnp.int32)
    return jax.vmap(lambda kk: jnp.searchsorted(kk, bv, side="right"))(k) - 1
timeit("vmap searchsorted", ss, skeys)

# single scalar point op chain x256 (horner cost model)
one = jax.tree.map(lambda a: a[0, 0], pts2)
def dbl256(p):
    return lax.fori_loop(0, 256, lambda i, q: JC.point_double(f, q), p)
timeit("256x scalar double fori", dbl256, one)
