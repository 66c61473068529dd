"""Honest MSM timing probe on the current default JAX device.

On the tunneled TPU backend `block_until_ready` can return before the
computation finishes; every sample therefore forces a device->host
transfer of the (tiny) result, which cannot complete early.

Usage: python tools/msm_probe.py [--log2n 12 16] [--c 8 16] [--g2]
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


def make_points(f, n, kind="g1"):
    from zklaim_tpu.ec import jaxcurve as JC
    from zklaim_tpu.ec.hostcurve import g1_generator, g2_generator
    from zklaim_tpu.ff.limbs import u64s_to_limbs

    gen = g1_generator() if kind == "g1" else g2_generator()
    gen_dev = JC.host_points_to_proj(f, [gen])
    tiled = jax.tree.map(lambda a: jnp.broadcast_to(a, (n,) + a.shape[1:]), gen_dev)
    small = jnp.asarray(u64s_to_limbs(np.arange(1, n + 1, dtype=np.uint64)))
    pts = jax.jit(JC.scalar_mul, static_argnums=0)(f, tiled, small)
    np.asarray(pts[0])  # force
    return pts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n", type=int, nargs="+", default=[12, 16])
    ap.add_argument("--c", type=int, nargs="+", default=[8, 16])
    ap.add_argument("--g2", action="store_true")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from zklaim_tpu.ec import jaxcurve as JC
    from zklaim_tpu.ec.hostcurve import g1_generator, g2_generator
    from zklaim_tpu.ff.limbs import ints_to_limbs
    from zklaim_tpu.ff.params import R
    from zklaim_tpu.msm.pippenger import msm

    f = JC.FQ2_OPS if args.g2 else JC.FQ_OPS
    kind = "g2" if args.g2 else "g1"
    print(f"device: {jax.devices()[0]}", flush=True)
    run = jax.jit(msm, static_argnums=(0, 3))

    for log2n in args.log2n:
        n = 1 << log2n
        t0 = time.perf_counter()
        points = make_points(f, n, kind)
        print(f"[{kind} n=2^{log2n}] points ready in {time.perf_counter()-t0:.1f}s", flush=True)
        rng = random.Random(20260819)
        scalars_int = [rng.randrange(R) for _ in range(n)]
        scalars = jnp.asarray(ints_to_limbs(scalars_int))
        for c in args.c:
            t0 = time.perf_counter()
            out = run(f, points, scalars, c)
            np.asarray(out[0])
            print(f"  c={c}: warmup(compile) {time.perf_counter()-t0:.1f}s", flush=True)
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.perf_counter()
                out = run(f, points, scalars, c)
                np.asarray(out[0])          # forced sync
                best = min(best, time.perf_counter() - t0)
            print(f"  c={c}: best {best*1e3:.1f} ms  ->  {n/best:,.0f} points/s", flush=True)
            if args.check:
                gen = g1_generator() if kind == "g1" else g2_generator()
                total = sum(s * (i + 1) for i, s in enumerate(scalars_int)) % R
                got = JC.proj_to_host_points(f, jax.tree.map(lambda a: a[None], out))[0]
                print(f"  c={c}: correct = {got == gen * total}", flush=True)


if __name__ == "__main__":
    main()
