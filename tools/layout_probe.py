"""Measure the layout overheads around the fused Pallas point-add.

Questions this answers on the real chip:
  1. ns/lane of ONE fused G1 add on AoS (N,16) coords (current API,
     includes per-call AoS->SoA transposes);
  2. ns/lane of the same add on pre-transposed SoA (16,N) planes
     (no transposes);
  3. cost of the (N,16)->(16,N) transpose alone;
  4. cost of a row gather on (N,16) vs on a packed (N,48) array;
  5. cost of a lane gather on SoA (16,N) along axis=1.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from zklaim_tpu.utils.jaxconfig import setup_cache

setup_cache()

import numpy as np
import jax
import jax.numpy as jnp


def bench(name, fn, *args, runs=5, lanes=None):
    # op + tiny checksum under ONE jit built once: per-sample cost is a
    # single dispatch + a scalar transfer (the tunneled backend charges
    # ~0.5 s for any fresh trace, which would swamp the measurement)
    run = jax.jit(
        lambda *a: sum(
            jnp.sum(l.astype(jnp.uint32)) for l in jax.tree.leaves(fn(*a))
        )
    )
    np.asarray(run(*args))
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        best = min(best, time.perf_counter() - t0)
    per = f"  = {best/lanes*1e9:7.1f} ns/lane" if lanes else ""
    print(f"  {name:32s} {best*1e3:9.2f} ms{per}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n", type=int, default=20)
    args = ap.parse_args()

    from zklaim_tpu.ec import jaxcurve as JC, pallas_curve as PC
    from zklaim_tpu.ec.hostcurve import g1_generator
    from zklaim_tpu.ff.limbs import u64s_to_limbs

    f = JC.FQ_OPS
    n = 1 << args.log2n
    print(f"G1, n=2^{args.log2n}")

    base = 1 << 14
    gen_dev = JC.host_points_to_proj(f, [g1_generator()])
    tiled = jax.tree.map(lambda a: jnp.broadcast_to(a, (base,) + a.shape[1:]), gen_dev)
    small = jnp.asarray(u64s_to_limbs((np.arange(base) % 65535 + 1).astype(np.uint64)))
    p14 = jax.jit(JC.scalar_mul, static_argnums=0)(f, tiled, small)
    np.asarray(p14[0])                        # force through the tunnel
    reps = n // base

    @jax.jit
    def tile_up(pt):
        return tuple(
            jnp.tile(c, (reps,) + (1,) * (c.ndim - 1)) for c in pt
        )

    p = tile_up(p14)
    q = tuple(jnp.roll(c, 7, axis=0) for c in p)
    q = jax.tree.map(jnp.copy, q)
    np.asarray(q[0]).ravel()[:1]

    # 0. dispatch + checksum floor
    bench("baseline (checksum only)", lambda pt: pt, p)

    # 1. AoS add (current API)
    add_aos = jax.jit(lambda p, q: PC.point_add(f, p, q))
    bench("pallas add, AoS in/out", add_aos, p, q, lanes=n)

    # 2. SoA add (no transposes)
    def to_soa(pt):
        return tuple(jnp.swapaxes(c, 0, 1) for c in pt)

    p_soa = jax.jit(to_soa)(p)
    q_soa = jax.jit(to_soa)(q)
    jax.block_until_ready((p_soa, q_soa))

    add_soa = jax.jit(
        lambda ps, qs: PC._padd_soa(1, n, ps[0], ps[1], ps[2], qs[0], qs[1], qs[2])
    )
    bench("pallas add, SoA in/out", add_soa, p_soa, q_soa, lanes=n)

    # 3. transpose alone
    bench("transpose (N,16)->(16,N) x3", jax.jit(to_soa), p)

    # 4. gathers
    order = jnp.asarray(np.random.default_rng(0).permutation(n).astype(np.int32))
    gather_aos = jax.jit(
        lambda pt, o: tuple(jnp.take(c, o, axis=0) for c in pt)
    )
    bench("row gather 3x(N,16)", gather_aos, p, order)

    packed = jax.jit(lambda pt: jnp.concatenate(pt, axis=1))(p)
    jax.block_until_ready(packed)
    gather_packed = jax.jit(lambda a, o: jnp.take(a, o, axis=0))
    bench("row gather (N,48) packed", gather_packed, packed, order)

    gather_soa = jax.jit(
        lambda pt, o: tuple(jnp.take(c, o, axis=1) for c in pt)
    )
    bench("lane gather 3x(16,N)", gather_soa, p_soa, order)

    # 5. strided even/odd slice (upsweep step input prep)
    eo_aos = jax.jit(lambda pt: tuple(c[0::2] for c in pt))
    bench("even slice 3x(N,16)[0::2]", eo_aos, p)
    eo_soa = jax.jit(lambda pt: tuple(c[:, 0::2] for c in pt))
    bench("even slice 3x(16,N)[:,0::2]", eo_soa, p_soa)
    half_soa = jax.jit(lambda pt: tuple(c[:, : n // 2] for c in pt))
    bench("half slice 3x(16,N)[:,:n/2]", half_soa, p_soa)


if __name__ == "__main__":
    main()
