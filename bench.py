"""Benchmark entry point: prints ONE JSON line for the driver.

Headline metric: G1 Pippenger MSM throughput (points/s) at 2^16 points
on the default device -- the primitive that dominates Groth16
setup/prove cost (BASELINE.md "MSM points/s per chip").

`python bench.py` runs the headline; `python bench.py --full` also runs
the end-to-end credential flow and reports prover latency instead.
vs_baseline is 1.0: the reference publishes no numbers (BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from zklaim_tpu.utils.jaxconfig import setup_cache

setup_cache()

import jax
import jax.numpy as jnp


def bench_msm(log2n: int = 16, c: int = 8, runs: int = 3):
    import numpy as np

    from zklaim_tpu.ec import jaxcurve as JC
    from zklaim_tpu.ec.hostcurve import g1_generator
    from zklaim_tpu.ff.limbs import ints_to_limbs, u64s_to_limbs
    from zklaim_tpu.ff.params import R
    from zklaim_tpu.msm.pippenger import msm

    n = 1 << log2n
    rng = np.random.default_rng(20260817)

    # generate n distinct points on device: (i+1) * G via one batched ladder
    gen_host = JC.host_points_to_proj(JC.FQ_OPS, [g1_generator()])
    tiled = jax.tree.map(lambda a: jnp.broadcast_to(a, (n,) + a.shape[1:]), gen_host)
    small = jnp.asarray(u64s_to_limbs(np.arange(1, n + 1, dtype=np.uint64)))
    points = jax.block_until_ready(
        jax.jit(JC.scalar_mul, static_argnums=0)(JC.FQ_OPS, tiled, small)
    )

    # random 254-bit scalars
    import random as _random

    prng = _random.Random(20260817)
    scalars = jnp.asarray(ints_to_limbs([prng.randrange(R) for _ in range(n)]))

    # Timing note: on the tunneled TPU backend block_until_ready can return
    # before the device finishes; np.asarray of the (tiny) result forces a
    # real device->host sync, so samples include one honest RPC round trip.
    run = jax.jit(msm, static_argnums=(0, 3))
    np.asarray(run(JC.FQ_OPS, points, scalars, c)[0])     # warmup/compile
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        out = run(JC.FQ_OPS, points, scalars, c)
        np.asarray(out[0])                                # forced sync
        best = min(best, time.perf_counter() - t0)
    return {
        "metric": f"g1_msm_2^{log2n}_points_per_sec",
        "value": round(n / best, 1),
        "unit": "points/s",
        "vs_baseline": 1.0,
    }


def bench_prover():
    import random

    from zklaim_tpu.cli import demo
    from zklaim_tpu.claims import signing
    from zklaim_tpu.claims.api import Context, Payload, ZKLAIM_OK, ZkOp

    rng = random.Random(1)
    ctx = Context()
    pl = Payload()
    pl.set_attr(23, 0)
    pl.data_ref = [18, 0, 0, 0, 0]
    pl.data_op = [ZkOp.GREATER_OR_EQ] + [ZkOp.NOOP] * 4
    ctx.add_payload(pl)
    ctx.hash_payloads(rng)
    assert ctx.trusted_setup(rng) == ZKLAIM_OK
    ctx.sign(signing.keygen(rng), rng)
    assert ctx.proof_generate(rng) == ZKLAIM_OK      # warmup (compiles)
    t0 = time.perf_counter()
    assert ctx.proof_generate(rng) == ZKLAIM_OK
    dt = time.perf_counter() - t0
    ctx.clear_pres()
    assert ctx.verify() == ZKLAIM_OK
    return {
        "metric": "groth16_prover_latency_1payload",
        "value": round(dt * 1e3, 1),
        "unit": "ms",
        "vs_baseline": 1.0,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="end-to-end prover latency")
    ap.add_argument("--log2n", type=int, default=16)
    args = ap.parse_args()
    result = bench_prover() if args.full else bench_msm(args.log2n)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
