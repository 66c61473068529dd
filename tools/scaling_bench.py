"""Scaling-efficiency harness: points/s/device at S = 1, 2, 4, 8 shards.

BASELINE.md asks for "MSM scaling efficiency, 1 chip -> N hosts >= 0.8".
Real multi-chip hardware is not attached in this environment, so this
harness measures the STRUCTURE of the scale-out (sharded MSM, four-step
NTT, data-parallel batched prove) on a virtual device mesh
(--xla_force_host_platform_device_count); on a pod slice the same code
paths run unchanged with `parallel.mesh.init_distributed()` +
`make_host_mesh()`.  Virtual-mesh numbers share 2 physical cores, so
absolute throughput is meaningless -- the table reports per-device work
division (elements processed / device) and wall time per step.

Usage:  python tools/scaling_bench.py [--log2n 14] [--out SCALING.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, ".")
import time

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# virtual shards are tiny; route every local MSM through the
# compile-cheap ladder so the harness measures the scale-out structure
os.environ.setdefault("ZKLAIM_MSM_LADDER_MAX", "16384")

import numpy as np

import jax

# the axon TPU plugin overrides JAX_PLATFORMS from the environment; the
# config API wins (same dance as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)


def _sync(tree):
    "block_until_ready can return early on tunneled backends; pull bytes."
    for leaf in __import__("jax").tree.leaves(tree):
        np.asarray(leaf.ravel()[:4])
    return tree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n", type=int, default=13)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from zklaim_tpu.ec import jaxcurve as JC
    from zklaim_tpu.ec.hostcurve import g1_generator
    from zklaim_tpu.ff.limbs import ints_to_limbs, u64s_to_limbs
    from zklaim_tpu.ff.params import R
    from zklaim_tpu.parallel.mesh import make_mesh
    from zklaim_tpu.parallel.msm import sharded_msm
    from zklaim_tpu.parallel.ntt import ShardedNTT

    import random

    n = 1 << args.log2n
    rng = random.Random(20260820)

    gen_host = JC.host_points_to_proj(JC.FQ_OPS, [g1_generator()])
    tiled = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (n,) + a.shape[1:]), gen_host
    )
    small = jnp.asarray(
        u64s_to_limbs(np.arange(1, n + 1, dtype=np.uint64))
    )
    points = _sync(
        jax.jit(JC.scalar_mul, static_argnums=0)(JC.FQ_OPS, tiled, small)
    )
    scalars = jnp.asarray(ints_to_limbs([rng.randrange(R) for _ in range(n)]))

    rows = []
    ref = None
    for S in (1, 2, 4, 8):
        if S > len(jax.devices()):
            break
        mesh = make_mesh(S)
        run = lambda: _sync(
            sharded_msm(mesh, JC.FQ_OPS, points, scalars, c=8)
        )
        run()                                   # compile
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        pts_per_s = n / dt
        if ref is None:
            ref = pts_per_s
        eff = pts_per_s / (ref * S)
        rows.append(
            {
                "shards": S,
                "points_per_device": n // S,
                "wall_s": round(dt, 4),
                "points_per_s": round(pts_per_s, 1),
                "efficiency_vs_1": round(eff, 3),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    # four-step NTT scaling at the same mesh sizes
    from zklaim_tpu.ff import montgomery as M
    from zklaim_tpu.ff.montgomery import FR

    coeffs = jnp.asarray(
        M.encode_ints(FR, [rng.randrange(R) for _ in range(n)])
    )
    ntt_rows = []
    for S in (1, 2, 4, 8):
        if S > len(jax.devices()):
            break
        mesh = make_mesh(S)
        plan = ShardedNTT(mesh, n)
        x = plan.to_matrix(coeffs)
        run = lambda: _sync(plan.intt_t(plan.ntt_t(x)))
        run()
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        ntt_rows.append(
            {"shards": S, "ntt_roundtrip_wall_s": round(dt, 4)}
        )
        print(json.dumps(ntt_rows[-1]), flush=True)

    if args.out:
        with open(args.out, "w") as fh:
            fh.write(
                "# Scaling harness (virtual {}-device CPU mesh, N=2^{})\n\n"
                "Structural run of the multi-chip code paths; see module "
                "docstring for why absolute\nthroughput on a virtual mesh "
                "is not a hardware efficiency number.\n\n".format(
                    len(jax.devices()), args.log2n
                )
            )
            fh.write("## sharded MSM (G1, c=8)\n\n")
            fh.write("| shards | points/device | wall s | points/s | eff vs 1 |\n")
            fh.write("|---|---|---|---|---|\n")
            for r in rows:
                fh.write(
                    f"| {r['shards']} | {r['points_per_device']} | "
                    f"{r['wall_s']} | {r['points_per_s']} | "
                    f"{r['efficiency_vs_1']} |\n"
                )
            fh.write("\n## four-step NTT round trip\n\n")
            fh.write("| shards | wall s |\n|---|---|\n")
            for r in ntt_rows:
                fh.write(f"| {r['shards']} | {r['ntt_roundtrip_wall_s']} |\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    sys.exit(main())
