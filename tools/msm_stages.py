"""Per-stage timing of the flat Pippenger pipeline on the current device.

Times CUMULATIVE PREFIXES of msm/pippenger._window_partials (each
program ends in a tiny u32 checksum so only bytes-sized results cross
the tunneled device->host link); successive differences attribute wall
time to each stage: digits, composite sort, gather+masks, upsweep tree,
tail prefixes, Abel reduction.
"""

from __future__ import annotations

import argparse
import random
import sys
import time

sys.path.insert(0, ".")

from zklaim_tpu.utils.jaxconfig import setup_cache

setup_cache()

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n", type=int, default=16)
    ap.add_argument("--c", type=int, default=8)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from zklaim_tpu.ec import jaxcurve as JC
    from zklaim_tpu.ff.limbs import ints_to_limbs, u64s_to_limbs
    from zklaim_tpu.ff.params import R
    from zklaim_tpu.msm import pippenger as P

    f = JC.FQ_OPS
    n = 1 << args.log2n
    c = args.c
    W = 256 // c
    B = 1 << (c - 1)
    M = W * n
    print(f"n=2^{args.log2n} c={c} W={W} B={B} flat M=2^{M.bit_length()-1}")

    from zklaim_tpu.ec.hostcurve import g1_generator

    gen_dev = JC.host_points_to_proj(f, [g1_generator()])
    tiled = jax.tree.map(lambda a: jnp.broadcast_to(a, (n,) + a.shape[1:]), gen_dev)
    small = jnp.asarray(u64s_to_limbs(np.arange(1, n + 1, dtype=np.uint64)))
    points = jax.jit(JC.scalar_mul, static_argnums=0)(f, tiled, small)
    np.asarray(points[0])
    rng = random.Random(20260820)
    scalars = jnp.asarray(ints_to_limbs([rng.randrange(R) for _ in range(n)]))

    add = P._backend_add(f)
    bucket_keys = (
        jnp.arange(W, dtype=jnp.int32)[:, None] * (B + 1)
        + jnp.arange(B + 1, dtype=jnp.int32)[None, :]
    ).reshape(-1)

    def stage_digits(points, scalars):
        return (P.signed_digits(scalars, c),)

    def stage_sort(points, scalars):
        (digits,) = stage_digits(points, scalars)
        mag = jnp.abs(digits)
        keys = (jnp.arange(W, dtype=jnp.int32)[:, None] * (B + 1) + mag).reshape(-1)
        src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (W, n)).reshape(-1)
        vals = src * 2 + (digits < 0).reshape(-1).astype(jnp.int32)
        return lax.sort_key_val(keys, vals)

    def stage_gather(points, scalars):
        skeys, svals = stage_sort(points, scalars)
        order = svals >> 1
        neg = (svals & 1) == 1
        is_zero = (skeys % (B + 1)) == 0
        x, y, z = points
        x = jnp.take(x, order, axis=0)
        y = jnp.take(y, order, axis=0)
        z = jnp.take(z, order, axis=0)
        y = f.select(neg, f.neg(y), y)
        zeros = f.zeros(JC._batch_shape(f, z))
        x = f.select(is_zero, zeros, x)
        z = f.select(is_zero, zeros, z)
        return (x, y, z), skeys

    def _upsweep(pts):
        levels = [pts]
        w = M
        while w > 1:
            cur = levels[-1]
            ev = jax.tree.map(lambda a: a[0::2], cur)
            od = jax.tree.map(lambda a: a[1::2], cur)
            levels.append(add(ev, od))
            w //= 2
        return levels

    def stage_upsweep(points, scalars):
        pts, skeys = stage_gather(points, scalars)
        return tuple(_upsweep(pts)[1:]), skeys

    def stage_tails(points, scalars):
        pts, skeys = stage_gather(points, scalars)
        levels = _upsweep(pts)
        u = jnp.searchsorted(skeys, bucket_keys, side="right") - 1
        m = u + 1
        acc = JC.point_infinity(f, m.shape)
        for t, lvl in enumerate(levels):
            wt = max(1, M >> t)
            idx = jnp.clip((m >> t) - 1, 0, wt - 1)
            node = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), lvl)
            bit = ((m >> t) & 1) == 1
            acc = JC.point_select(f, bit, add(acc, node), acc)
        return (acc,)

    def stage_partials(points, scalars):
        return P._window_partials(f, points, scalars, c)

    def checksum(fn):
        def run(points, scalars):
            out = fn(points, scalars)
            return sum(
                jnp.sum(leaf.astype(jnp.uint32))
                for leaf in jax.tree.leaves(out)
            )
        return jax.jit(run)

    prev = 0.0
    for name, fn in [
        ("digits", stage_digits),
        ("+sort", stage_sort),
        ("+gather/masks", stage_gather),
        ("+upsweep", stage_upsweep),
        ("+tails", stage_tails),
        ("+abel (partials)", stage_partials),
    ]:
        run = checksum(fn)
        np.asarray(run(points, scalars))
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            np.asarray(run(points, scalars))
            best = min(best, time.perf_counter() - t0)
        print(f"  {name:20s} cum {best*1e3:9.2f} ms   (+{(best-prev)*1e3:8.2f} ms)", flush=True)
        prev = best

    run = jax.jit(P.msm, static_argnums=(0, 3))
    out = run(f, points, scalars, c)
    np.asarray(out[0])
    best = float("inf")
    for _ in range(args.runs):
        t0 = time.perf_counter()
        out = run(f, points, scalars, c)
        np.asarray(out[0])
        best = min(best, time.perf_counter() - t0)
    print(f"  {'FULL msm':20s} cum {best*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
