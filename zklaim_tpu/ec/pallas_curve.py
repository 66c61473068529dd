"""Fused complete point-add/double Pallas kernels for BN254 G1/G2.

The MSM inner loop is a chain of complete projective adds over wide
batches (msm/pippenger.py).  On the XLA path every one of the ~14 field
multiplies inside an add round-trips its (N, 16, 16)-sized intermediates
through HBM; fused in Pallas the whole add reads 6 and writes 3 field
elements per lane and keeps everything else in VMEM -- a >10x cut in
HBM traffic for the bandwidth-bound bucket accumulation (reference hot
loop: libsnark multi_exp; SURVEY.md §2.6 row 3).

Formulas: Renes-Costello-Batina 2016 complete addition/doubling for
a = 0 short-Weierstrass curves, the same dataflow as ec/jaxcurve.py
point_add/point_double (results are bit-identical).

Layout: kernels are struct-of-arrays -- each Fq coordinate is (16, N)
uint32 (limbs on sublanes); G2 coordinates are (2, 16, N).  Wrappers
accept/return the jaxcurve AoS layout, i.e. (N, 16) / (N, 2, 16).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ff import pallas_field as PF
from ..ff.limbs import NUM_LIMBS
from ..ff.montgomery import FQ
from .hostcurve import B_G2
from .jaxcurve import FQ_OPS

LANES = 512          # lane-axis tile; multiple of 128

# The fused add chains ~14 Montgomery multiplies whose limb intermediates
# all live on the kernel stack; at the default 16 MiB scoped-VMEM budget the
# compiler OOMs around 3.5k G1 lanes.  v5e/v6 chips have 128 MiB of VMEM, so
# raise the per-kernel budget and let the grid pipeline the rest.
_VMEM_LIMIT = 100 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel",), vmem_limit_bytes=_VMEM_LIMIT
)


def _interpret() -> bool:
    """Mosaic only targets real TPUs; interpret elsewhere (CPU tests)."""
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Field-op namespaces over the SoA in-kernel layout
# ---------------------------------------------------------------------------


class _Fq:
    """(16, N) Montgomery Fq values inside a kernel.

    Pallas kernels may not close over array constants, so the field
    constants arrive as kernel operands and are bound here per call.
    """

    deg = 1

    def __init__(self, p_col, np_col):
        self.p = p_col
        self.np = np_col

    def mul(self, a, b):
        return PF.mont_mul(a, b, self.p, self.np)

    def add(self, a, b):
        return PF.add_mod(a, b, self.p)

    def sub(self, a, b):
        return PF.sub_mod(a, b, self.p)

    def dbl(self, a):
        return PF.dbl_mod(a, self.p)

    def mul_b3(self, x):
        """9x: 3b for the G1 curve constant b = 3."""
        return PF.mul_small(x, 9, self.p)


def _b3_g2_cols() -> np.ndarray:
    from ..ff import montgomery as M

    b3 = B_G2 * 3
    return np.stack(
        [
            np.asarray(M.encode_ints(M.FQ, [b3.c0])[0], dtype=np.uint32),
            np.asarray(M.encode_ints(M.FQ, [b3.c1])[0], dtype=np.uint32),
        ]
    ).reshape(2, NUM_LIMBS, 1)


_B3_G2 = _b3_g2_cols()


class _Fq2:
    """(2, 16, N) Montgomery Fq2 values inside a kernel (Karatsuba)."""

    deg = 2

    def __init__(self, p_col, np_col, b3):
        self.fq = _Fq(p_col, np_col)
        self.b3 = b3                        # (2, 16, 1)

    def mul(self, a, b):
        fq = self.fq
        t0 = fq.mul(a[0], b[0])
        t1 = fq.mul(a[1], b[1])
        t2 = fq.mul(fq.add(a[0], a[1]), fq.add(b[0], b[1]))
        c0 = fq.sub(t0, t1)
        c1 = fq.sub(fq.sub(t2, t0), t1)
        return jnp.stack([c0, c1], axis=0)

    # PF.add_mod/sub_mod treat axis 0 as limbs, so apply per component
    def add(self, a, b):
        fq = self.fq
        return jnp.stack([fq.add(a[0], b[0]), fq.add(a[1], b[1])])

    def sub(self, a, b):
        fq = self.fq
        return jnp.stack([fq.sub(a[0], b[0]), fq.sub(a[1], b[1])])

    def dbl(self, a):
        fq = self.fq
        return jnp.stack([fq.dbl(a[0]), fq.dbl(a[1])])

    def mul_b3(self, x):
        return self.mul(x, jnp.broadcast_to(self.b3, x.shape))


# ---------------------------------------------------------------------------
# RCB16 complete group law on in-kernel values
# ---------------------------------------------------------------------------


def _rcb_add(f, p, q):
    """Complete projective add; mirrors jaxcurve.point_add dataflow."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    t0 = f.mul(x1, x2)
    t1 = f.mul(y1, y2)
    t2 = f.mul(z1, z2)
    m0 = f.mul(f.add(x1, y1), f.add(x2, y2))
    m1 = f.mul(f.add(y1, z1), f.add(y2, z2))
    m2 = f.mul(f.add(x1, z1), f.add(x2, z2))
    t3 = f.sub(m0, f.add(t0, t1))
    t4 = f.sub(m1, f.add(t1, t2))
    t5 = f.sub(m2, f.add(t0, t2))
    m = f.add(f.dbl(t0), t0)
    n = f.mul_b3(t2)
    bv = f.mul_b3(t5)
    wmn = f.sub(t1, n)
    wpn = f.add(t1, n)
    x3 = f.sub(f.mul(t3, wmn), f.mul(t4, bv))
    y3 = f.add(f.mul(wpn, wmn), f.mul(m, bv))
    z3 = f.add(f.mul(t4, wpn), f.mul(t3, m))
    return x3, y3, z3


def _rcb_double(f, p):
    """Complete projective doubling; mirrors jaxcurve.point_double."""
    x, y, z = p
    t0 = f.mul(y, y)
    t1 = f.mul(y, z)
    t2 = f.mul(z, z)
    t3 = f.mul(x, y)
    z8 = f.dbl(f.dbl(f.dbl(t0)))
    n = f.mul_b3(t2)
    n3 = f.add(f.dbl(n), n)
    t0m = f.sub(t0, n3)
    t0p = f.add(t0, n)
    z3 = f.mul(t1, z8)
    y3 = f.add(f.mul(t0m, t0p), f.mul(n, z8))
    x3 = f.dbl(f.mul(t0m, t3))
    return x3, y3, z3


# ---------------------------------------------------------------------------
# pallas_call wrappers (AoS (N, 16)/(N, 2, 16) in and out)
# ---------------------------------------------------------------------------


def _field(fdeg, const_refs):
    if fdeg == 1:
        p_ref, np_ref = const_refs
        return _Fq(p_ref[:], np_ref[:])
    p_ref, np_ref, b3_ref = const_refs
    return _Fq2(p_ref[:], np_ref[:], b3_ref[:])


def _add_kernel(fdeg, *refs):
    n_const = 2 if fdeg == 1 else 3
    f = _field(fdeg, refs[:n_const])
    x1, y1, z1, x2, y2, z2, xo, yo, zo = refs[n_const:]
    r = _rcb_add(f, (x1[:], y1[:], z1[:]), (x2[:], y2[:], z2[:]))
    xo[:], yo[:], zo[:] = r


def _double_kernel(fdeg, *refs):
    n_const = 2 if fdeg == 1 else 3
    f = _field(fdeg, refs[:n_const])
    x, y, z, xo, yo, zo = refs[n_const:]
    r = _rcb_double(f, (x[:], y[:], z[:]))
    xo[:], yo[:], zo[:] = r


def _const_operands(fdeg):
    """(arrays, BlockSpecs) for the field-constant kernel operands."""
    p = jnp.asarray(PF.FQ_P)
    np_ = jnp.asarray(PF.FQ_NP)
    if fdeg == 1:
        arrs = (p, np_)
    else:
        arrs = (p, np_, jnp.asarray(_B3_G2))
    specs = [
        pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for a in arrs
    ]
    return arrs, specs


def _soa(f, coord):
    """(N, 16) -> (16, N) or (N, 2, 16) -> (2, 16, N)."""
    if f.deg == 1:
        return jnp.swapaxes(coord, 0, 1)
    return jnp.moveaxis(coord, 0, 2)


def _aos(f, coord):
    if f.deg == 1:
        return jnp.swapaxes(coord, 0, 1)
    return jnp.moveaxis(coord, 2, 0)


def _block_shape(fdeg, n):
    return (16, n) if fdeg == 1 else (2, 16, n)


def _index_map(fdeg):
    if fdeg == 1:
        return lambda i: (0, i)
    return lambda i: (0, 0, i)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _padd_soa(fdeg, n, *coords):
    tile = min(LANES, n)
    grid = (n // tile,)
    spec = pl.BlockSpec(
        _block_shape(fdeg, tile), _index_map(fdeg), memory_space=pltpu.VMEM
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct(_block_shape(fdeg, n), jnp.uint32)
        for _ in range(3)
    )
    consts, const_specs = _const_operands(fdeg)
    return pl.pallas_call(
        functools.partial(_add_kernel, fdeg),
        grid=grid,
        in_specs=const_specs + [spec] * 6,
        out_specs=(spec,) * 3,
        out_shape=out_shape,
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(*consts, *coords)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _pdouble_soa(fdeg, n, *coords):
    tile = min(LANES, n)
    grid = (n // tile,)
    spec = pl.BlockSpec(
        _block_shape(fdeg, tile), _index_map(fdeg), memory_space=pltpu.VMEM
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct(_block_shape(fdeg, n), jnp.uint32)
        for _ in range(3)
    )
    consts, const_specs = _const_operands(fdeg)
    return pl.pallas_call(
        functools.partial(_double_kernel, fdeg),
        grid=grid,
        in_specs=const_specs + [spec] * 3,
        out_specs=(spec,) * 3,
        out_shape=out_shape,
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(*consts, *coords)


def _pad_lanes(soa_coord, n, n_pad):
    if n_pad == n:
        return soa_coord
    pad = [(0, 0)] * (soa_coord.ndim - 1) + [(0, n_pad - n)]
    return jnp.pad(soa_coord, pad)


def _lane_count(fops, aos_coord):
    return aos_coord.shape[0]


def _padded_lanes(n: int) -> int:
    """Round up to a 128 multiple, then to a LANES multiple when tiling.

    Interpret mode (CPU tests) has no lane-tiling constraint; padding
    there only multiplies the simulation cost, so skip it."""
    if _interpret():
        return n
    n_pad = max(128, -(-n // 128) * 128)
    if n_pad > LANES:
        n_pad = -(-n_pad // LANES) * LANES
    return n_pad


# ---------------------------------------------------------------------------
# SoA masked add: the MSM prefix-scan round (select(mask, p+q, p))
# ---------------------------------------------------------------------------

# Lane tile for the scan-round kernel.  Bounded by the 16 MiB scoped-VMEM
# limit: the fused add needs ~1.3 KiB VMEM per G1 lane (measured: 43 MiB
# at 2^15 lanes), ~2.6 KiB per G2 lane.
SCAN_TILE = {1: 4096, 2: 2048}


def _masked_add_kernel(fdeg, *refs):
    n_const = 2 if fdeg == 1 else 3
    f = _field(fdeg, refs[:n_const])
    m_ref, x1, y1, z1, x2, y2, z2, xo, yo, zo = refs[n_const:]
    p = (x1[:], y1[:], z1[:])
    r = _rcb_add(f, p, (x2[:], y2[:], z2[:]))
    m = m_ref[:] != 0                       # (1, tile)
    if fdeg == 2:
        m = m[None]                          # broadcast over the tower axis
    xo[:] = jnp.where(m, r[0], p[0])
    yo[:] = jnp.where(m, r[1], p[1])
    zo[:] = jnp.where(m, r[2], p[2])


@functools.partial(jax.jit, static_argnums=(0, 1))
def _masked_add_soa(fdeg, n, mask, *coords):
    """select(mask, p + q, p) on SoA coords; mask (1, n) int32.

    coords: x1,y1,z1,x2,y2,z2 each (16, n) [G1] or (2, 16, n) [G2]."""
    tile = min(SCAN_TILE[fdeg], n)
    grid = (n // tile,)
    spec = pl.BlockSpec(
        _block_shape(fdeg, tile), _index_map(fdeg), memory_space=pltpu.VMEM
    )
    mspec = pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = tuple(
        jax.ShapeDtypeStruct(_block_shape(fdeg, n), jnp.uint32)
        for _ in range(3)
    )
    consts, const_specs = _const_operands(fdeg)
    return pl.pallas_call(
        functools.partial(_masked_add_kernel, fdeg),
        grid=grid,
        in_specs=const_specs + [mspec] + [spec] * 6,
        out_specs=(spec,) * 3,
        out_shape=out_shape,
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(*consts, mask, *coords)


def to_soa(fops, pt):
    """AoS point pytree (N, 16)/(N, 2, 16) -> SoA (16, N)/(2, 16, N)."""
    return tuple(_soa(fops, c) for c in pt)


def from_soa(fops, pt):
    return tuple(_aos(fops, c) for c in pt)


def prefix_scan_soa(fops, pt, n: int):
    """Unsegmented inclusive prefix sum over the lane axis of SoA points.

    Hillis-Steele, statically unrolled: log2(n) fused masked-add rounds;
    the shift is an XLA lane-roll between kernels (traffic-trivial next
    to the adds).  Bit-identical to jaxcurve point_add folds."""
    logn = max(1, (n - 1).bit_length())
    lane_axis = 1 if fops.deg == 1 else 2
    idx = jnp.arange(n)
    for t in range(logn):
        d = 1 << t
        mask = (idx >= d).astype(jnp.uint32)[None, :]
        shifted = tuple(jnp.roll(c, d, axis=lane_axis) for c in pt)
        out = _masked_add_soa(fops.deg, n, mask, *pt, *shifted)
        pt = out
    return pt


def point_add(fops, p, q):
    """Fused complete add; drop-in for jaxcurve.point_add on (N,)-batched
    pytrees.  fops: jaxcurve.FQ_OPS or FQ2_OPS."""
    n = _lane_count(fops, p[0])
    n_pad = _padded_lanes(n)
    ins = []
    for pt in (p, q):
        for c in pt:
            ins.append(_pad_lanes(_soa(fops, c), n, n_pad))
    outs = _padd_soa(fops.deg, n_pad, *ins)
    return tuple(_aos(fops, o)[:n] for o in outs)


def point_double(fops, p):
    n = _lane_count(fops, p[0])
    n_pad = _padded_lanes(n)
    ins = [_pad_lanes(_soa(fops, c), n, n_pad) for c in p]
    outs = _pdouble_soa(fops.deg, n_pad, *ins)
    return tuple(_aos(fops, o)[:n] for o in outs)
