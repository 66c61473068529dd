"""Fused Pallas butterfly stages for the radix-2 NTT (TPU hot path).

Why: the XLA lowering of ff/montgomery.mont_mul materializes its
(..., 16, 16) outer-product intermediates through HBM — measured 410
ns/elem amplified on v5e, vs <8 ns/elem for the same REDC expressed as
a Pallas kernel over struct-of-arrays (16, N) planes (the whole multiply
stays in VMEM/registers).  Twenty butterfly stages through the XLA path
put a 2^20 transform at ~4 s; the reference's libfqfft does the same
transform in tens of ms on a laptop (SURVEY.md §2.6 row 4), so this
kernel is what makes the TPU prover competitive.

Design:
  - data is kept AoS (n, 16) at the API boundary (radix2.NTTDomain
    contract) and transposed ONCE to (16, n) SoA planes per transform;
  - each stage is one fused pallas_call computing BOTH butterfly
    outputs (a + tw*b, a - tw*b) — a single Montgomery multiply plus
    add/sub per pair, all intermediates in VMEM;
  - pair extraction/interleaving between stages is XLA reshape/slice
    glue on the lane axis, inside the same jit (no host round trips);
  - per-stage full-width twiddle planes are broadcast on device from
    the compact (m/2, 16) tables — no big persistent twiddle arrays.

Used automatically by radix2.NTTDomain for 2-D (n, 16) inputs on real
TPUs (ZKLAIM_NTT_PALLAS=0 disables; =1 forces interpret mode on CPU
for tests).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ff import pallas_field as PF
from ..ff.limbs import NUM_LIMBS

LANES = 4096          # lane tile per grid step; multiple of 128

_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("arbitrary",),
    vmem_limit_bytes=100 * 1024 * 1024,
)


def use_pallas() -> bool:
    """Fused stages on real TPUs; tests opt in on CPU (interpret)."""
    if os.environ.get("ZKLAIM_NTT_PALLAS") == "0":
        return False
    return (
        jax.default_backend() == "tpu"
        or os.environ.get("ZKLAIM_NTT_PALLAS") == "1"
    )


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _mul_kernel(p_ref, np_ref, a_ref, b_ref, o_ref):
    o_ref[:] = PF.mont_mul(a_ref[:], b_ref[:], p_ref[:], np_ref[:])


def bulk_mul(spec, a, b):
    """Elementwise Montgomery product on (16, W) SoA planes."""
    w = a.shape[1]
    tile = min(LANES, w)
    p_col, np_col = PF.field_consts(spec)
    return pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, w), jnp.uint32),
        grid=(w // tile,),
        in_specs=[pl.BlockSpec((NUM_LIMBS, 1), lambda i: (0, 0))] * 2
        + [pl.BlockSpec((NUM_LIMBS, tile), lambda i: (0, i))] * 2,
        out_specs=pl.BlockSpec((NUM_LIMBS, tile), lambda i: (0, i)),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(jnp.asarray(p_col), jnp.asarray(np_col), a, b)


def mont_mul_aos(spec, a, b):
    """(n, 16) x (n, 16) AoS Montgomery product via the fused kernel.

    Drop-in for ff.montgomery.mont_mul on large 2-D batches (the caller
    guards shape/backend; see montgomery.mont_mul_bulk)."""
    a_soa = jnp.swapaxes(a, 0, 1)
    b_soa = jnp.swapaxes(b, 0, 1)
    return jnp.swapaxes(bulk_mul(spec, a_soa, b_soa), 0, 1)


def _eligible(n: int) -> bool:
    """Lane widths the kernels handle: n/2 a multiple of 128 (or equal
    to a whole tile division)."""
    return n >= 256 and (n // 2) % 128 == 0


def _local_multi_kernel(p_ref, np_ref, x_ref, tw_ref, o_ref, *, stages):
    """ALL butterfly stages with pair distance < tile, fused: the tile
    is loaded once, `stages` consecutive roll/select rounds run on it in
    VMEM, and it is written once.  One Mosaic kernel instead of one per
    stage: ~12x fewer HBM round trips for the local stages AND ~12x
    fewer kernel compiles (the per-stage version put the cold prover at
    ~570 s of Mosaic compilation).

    Per stage idx (m = 2^(idx+1), half = 2^idx), for an 'a' lane j
    ((j & half) == 0): y = x + tw * x[j+half]; for a 'b' lane:
    y = x[j-half] - tw * x.  tw planes are packed side by side,
    (16, stages*tile), tile-periodic.  Tile-edge roll wraparound lanes
    are never selected (first half-block all 'a', last all 'b').
    """
    p, npv = p_ref[:], np_ref[:]
    x = x_ref[:]
    tile = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    for idx in range(stages):
        half = 1 << idx
        tw = tw_ref[:, idx * tile : (idx + 1) * tile]
        down = pltpu.roll(x, shift=tile - half, axis=1)   # x[j + half]
        up = pltpu.roll(x, shift=half, axis=1)            # x[j - half]
        prod_down = PF.mont_mul(tw, down, p, npv)
        prod_self = PF.mont_mul(tw, x, p, npv)
        s = PF.add_mod(x, prod_down, p)
        d = PF.sub_mod(up, prod_self, p)
        x = jnp.where((lane & half) == 0, s, d)
    o_ref[:] = x


def _stages_local(spec, x, tw_pack, stages):
    """Run the first `stages` butterfly stages (all pairs within one
    lane tile) as a single fused kernel."""
    n = x.shape[1]
    tile = min(LANES, n)
    p_col, np_col = PF.field_consts(spec)
    return pl.pallas_call(
        functools.partial(_local_multi_kernel, stages=stages),
        out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, n), jnp.uint32),
        grid=(n // tile,),
        in_specs=[pl.BlockSpec((NUM_LIMBS, 1), lambda i: (0, 0))] * 2
        + [
            pl.BlockSpec((NUM_LIMBS, tile), lambda i: (0, i)),
            pl.BlockSpec((NUM_LIMBS, stages * tile), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((NUM_LIMBS, tile), lambda i: (0, i)),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(jnp.asarray(p_col), jnp.asarray(np_col), x, tw_pack)


def _global_stage_kernel(p_ref, np_ref, xs_ref, xp_ref, tw_ref, o_ref, *, K):
    """Butterfly stage with pair distance >= TILE.

    Each grid step produces ONE output tile in place: the index maps
    deliver the tile itself and its partner tile (distance K tiles =
    m/2 lanes); whether this tile holds 'a+tw*b' or 'a-tw*b' outcomes
    depends on its half-block position q = program_id mod 2K.
    """
    p, npv = p_ref[:], np_ref[:]
    q = pl.program_id(0) % (2 * K)
    self_ = xs_ref[:]
    part = xp_ref[:]
    tw = tw_ref[:]
    o_ref[:] = jax.lax.cond(
        q < K,
        lambda: PF.add_mod(self_, PF.mont_mul(tw, part, p, npv), p),
        lambda: PF.sub_mod(part, PF.mont_mul(tw, self_, p, npv), p),
    )


def _stage_global(spec, x, tw_soa, m):
    """Pair distance m/2 >= tile: tile-level index maps do the pairing;
    output written in place tile by tile (no interleave glue)."""
    n = x.shape[1]
    tile = min(LANES, m // 2)
    K = (m // 2) // tile
    p_col, np_col = PF.field_consts(spec)
    return pl.pallas_call(
        functools.partial(_global_stage_kernel, K=K),
        out_shape=jax.ShapeDtypeStruct((NUM_LIMBS, n), jnp.uint32),
        grid=(n // tile,),
        in_specs=[pl.BlockSpec((NUM_LIMBS, 1), lambda i: (0, 0))] * 2
        + [
            pl.BlockSpec((NUM_LIMBS, tile), lambda i: (0, i)),
            pl.BlockSpec(
                (NUM_LIMBS, tile),
                lambda i: (
                    0,
                    (i // (2 * K)) * 2 * K + (i % (2 * K) + K) % (2 * K),
                ),
            ),
            pl.BlockSpec((NUM_LIMBS, tile), lambda i: (0, i % K)),
        ],
        out_specs=pl.BlockSpec((NUM_LIMBS, tile), lambda i: (0, i)),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(jnp.asarray(p_col), jnp.asarray(np_col), x, x, tw_soa)


def ntt_soa(dom, x_soa, tables, inverse: bool):
    """Full DIT transform on (16, n) SoA planes; input already
    bit-reversed by the caller.  Matches radix2._butterflies exactly."""
    from ..ff.montgomery import FR

    n = dom.n
    tile = min(LANES, n)
    x = x_soa
    key = "tw_inv" if inverse else "tw"

    def tile_pattern(s):
        # per m-block the a half and the b half both carry the block's
        # (m/2) twiddles; tile-periodic since m <= tile
        m = 1 << (s + 1)
        tw_soa = jnp.swapaxes(tables[key][s], 0, 1)     # (16, m/2)
        return jnp.broadcast_to(
            tw_soa[:, None, None, :], (NUM_LIMBS, tile // m, 2, m // 2)
        ).reshape(NUM_LIMBS, tile)

    n_local = min(dom.k, tile.bit_length() - 1)
    if n_local > 0:
        pack = jnp.concatenate(
            [tile_pattern(s) for s in range(n_local)], axis=1
        )
        x = _stages_local(FR, x, pack, n_local)
    for s in range(n_local, dom.k):
        m = 1 << (s + 1)
        tw_soa = jnp.swapaxes(tables[key][s], 0, 1)     # (16, m/2)
        x = _stage_global(FR, x, tw_soa, m)
    if inverse:
        n_inv = jnp.broadcast_to(
            jnp.swapaxes(tables["n_inv"].reshape(1, NUM_LIMBS), 0, 1),
            (NUM_LIMBS, n),
        )
        x = bulk_mul(FR, x, n_inv)
    return x


def ntt_aos(dom, x, tables, inverse: bool):
    """(n, 16) AoS in/out wrapper: bitrev gather + one transpose each way."""
    x = jnp.take(x, tables["bitrev"], axis=0)
    x_soa = jnp.swapaxes(x, 0, 1)
    out = ntt_soa(dom, x_soa, tables, inverse)
    return jnp.swapaxes(out, 0, 1)
