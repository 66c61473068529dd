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

Layout: kernels are struct-of-arrays and STRICTLY 2D -- every ref is a
(16, N) uint32 block (limbs on sublanes, batch on lanes).  An Fq2
coordinate is passed as TWO such refs (c0, c1) and represented in-kernel
as a Python tuple, never as a stacked (2, 16, N) array: Mosaic's vector
layout pass mis-tiles 3D blocks whose major dim is 2 (vector_extract_rule
CHECK failure `limits[i] <= dim(i)` seen on v5e), and 2D blocks are the
native tiling anyway.
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
from .hostcurve import B_G2

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
# Field-op namespaces over the in-kernel layout
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


def _b3_g2_cols() -> tuple[np.ndarray, np.ndarray]:
    from ..ff import montgomery as M

    b3 = B_G2 * 3
    return (
        np.asarray(M.encode_ints(M.FQ, [b3.c0])[0], dtype=np.uint32)
        .reshape(NUM_LIMBS, 1),
        np.asarray(M.encode_ints(M.FQ, [b3.c1])[0], dtype=np.uint32)
        .reshape(NUM_LIMBS, 1),
    )


_B3_G2 = _b3_g2_cols()


class _Fq2:
    """Fq2 values inside a kernel: tuples (c0, c1) of (16, N) arrays."""

    deg = 2

    def __init__(self, p_col, np_col, b3c0, b3c1):
        self.fq = _Fq(p_col, np_col)
        self.b3 = (b3c0, b3c1)              # each (16, tile), pre-broadcast

    def mul(self, a, b):
        fq = self.fq
        t0 = fq.mul(a[0], b[0])
        t1 = fq.mul(a[1], b[1])
        t2 = fq.mul(fq.add(a[0], a[1]), fq.add(b[0], b[1]))
        return (fq.sub(t0, t1), fq.sub(fq.sub(t2, t0), t1))

    def add(self, a, b):
        fq = self.fq
        return (fq.add(a[0], b[0]), fq.add(a[1], b[1]))

    def sub(self, a, b):
        fq = self.fq
        return (fq.sub(a[0], b[0]), fq.sub(a[1], b[1]))

    def dbl(self, a):
        fq = self.fq
        return (fq.dbl(a[0]), fq.dbl(a[1]))

    def mul_b3(self, x):
        return self.mul(x, self.b3)


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
    p_ref, np_ref, b30_ref, b31_ref = const_refs
    return _Fq2(p_ref[:], np_ref[:], b30_ref[:], b31_ref[:])


def _n_const(fdeg):
    return 2 if fdeg == 1 else 4


def _read_coord(fdeg, refs):
    """fdeg consecutive refs -> one in-kernel field value."""
    if fdeg == 1:
        return refs[0][:]
    return (refs[0][:], refs[1][:])


def _write_coord(fdeg, refs, val):
    if fdeg == 1:
        refs[0][:] = val
    else:
        refs[0][:] = val[0]
        refs[1][:] = val[1]


def _coords(fdeg, refs, count):
    """Split a flat ref list into `count` coordinate groups of fdeg refs."""
    return [refs[i * fdeg:(i + 1) * fdeg] for i in range(count)]


def _add_kernel(fdeg, *refs):
    nc = _n_const(fdeg)
    f = _field(fdeg, refs[:nc])
    groups = _coords(fdeg, refs[nc:], 9)            # 6 in + 3 out
    p = tuple(_read_coord(fdeg, g) for g in groups[:3])
    q = tuple(_read_coord(fdeg, g) for g in groups[3:6])
    r = _rcb_add(f, p, q)
    for g, val in zip(groups[6:], r):
        _write_coord(fdeg, g, val)


def _double_kernel(fdeg, *refs):
    nc = _n_const(fdeg)
    f = _field(fdeg, refs[:nc])
    groups = _coords(fdeg, refs[nc:], 6)            # 3 in + 3 out
    p = tuple(_read_coord(fdeg, g) for g in groups[:3])
    r = _rcb_double(f, p)
    for g, val in zip(groups[3:], r):
        _write_coord(fdeg, g, val)


def _const_operands(fdeg, tile):
    """(arrays, BlockSpecs) for the field-constant kernel operands.

    Constants are pre-broadcast to full (16, tile) blocks: lane-dim-1
    blocks (and in-kernel lane broadcasts of refs) hit a Mosaic
    vector-layout CHECK failure on v5e, and full blocks cost only a few
    KiB of VMEM."""
    cols = [PF.FQ_P, PF.FQ_NP]
    if fdeg == 2:
        cols += [_B3_G2[0], _B3_G2[1]]
    arrs = tuple(
        jnp.asarray(np.broadcast_to(c, (NUM_LIMBS, tile))) for c in cols
    )
    spec = pl.BlockSpec(
        (NUM_LIMBS, tile), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return arrs, [spec] * len(arrs)


def _soa(f, coord):
    """AoS coordinate -> tuple of (16, N) planes.

    G1: (N, 16) -> ((16, N),).  G2: (N, 2, 16) -> ((16, N), (16, N))."""
    if f.deg == 1:
        return (jnp.swapaxes(coord, 0, 1),)
    return (
        jnp.swapaxes(coord[:, 0, :], 0, 1),
        jnp.swapaxes(coord[:, 1, :], 0, 1),
    )


def _aos(f, planes):
    """Inverse of _soa."""
    if f.deg == 1:
        return jnp.swapaxes(planes[0], 0, 1)
    return jnp.stack(
        [jnp.swapaxes(planes[0], 0, 1), jnp.swapaxes(planes[1], 0, 1)], axis=1
    )


@functools.partial(jax.jit, static_argnums=(0, 1))
def _padd_soa(fdeg, n, *planes):
    """planes: 6*fdeg arrays of (16, n); returns 3*fdeg planes."""
    tile = min(LANES, n)
    grid = (n // tile,)
    spec = pl.BlockSpec((16, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = tuple(
        jax.ShapeDtypeStruct((16, n), jnp.uint32) for _ in range(3 * fdeg)
    )
    consts, const_specs = _const_operands(fdeg, tile)
    return pl.pallas_call(
        functools.partial(_add_kernel, fdeg),
        grid=grid,
        in_specs=const_specs + [spec] * (6 * fdeg),
        out_specs=(spec,) * (3 * fdeg),
        out_shape=out_shape,
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(*consts, *planes)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _pdouble_soa(fdeg, n, *planes):
    tile = min(LANES, n)
    grid = (n // tile,)
    spec = pl.BlockSpec((16, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = tuple(
        jax.ShapeDtypeStruct((16, n), jnp.uint32) for _ in range(3 * fdeg)
    )
    consts, const_specs = _const_operands(fdeg, tile)
    return pl.pallas_call(
        functools.partial(_double_kernel, fdeg),
        grid=grid,
        in_specs=const_specs + [spec] * (3 * fdeg),
        out_specs=(spec,) * (3 * fdeg),
        out_shape=out_shape,
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(*consts, *planes)


def _pad_lanes(plane, n, n_pad):
    if n_pad == n:
        return plane
    return jnp.pad(plane, ((0, 0), (0, n_pad - n)))


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


def _unpack_point(f, planes):
    """3*fdeg output planes -> AoS (x, y, z) coordinate arrays."""
    k = f.deg
    return tuple(
        _aos(f, planes[i * k:(i + 1) * k]) for i in range(3)
    )


@functools.partial(jax.jit, static_argnums=(0, 1))
def _padd_halves_soa(fdeg, n, *planes):
    """planes: 3*fdeg arrays (16, n); returns lo-half + hi-half summed,
    3*fdeg arrays (16, n/2).  Each input plane is read TWICE through
    different block index maps (tile i and tile i + n/2/tile), so the
    halving-tree reduction needs no XLA slice copies at all."""
    half = n // 2
    tile = min(LANES, half)
    kh = half // tile
    spec_lo = pl.BlockSpec((16, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_hi = pl.BlockSpec(
        (16, tile), lambda i: (0, i + kh), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec((16, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = tuple(
        jax.ShapeDtypeStruct((16, half), jnp.uint32) for _ in range(3 * fdeg)
    )
    consts, const_specs = _const_operands(fdeg, tile)
    return pl.pallas_call(
        functools.partial(_add_kernel, fdeg),
        grid=(kh,),
        in_specs=const_specs + [spec_lo] * (3 * fdeg) + [spec_hi] * (3 * fdeg),
        out_specs=(out_spec,) * (3 * fdeg),
        out_shape=out_shape,
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(*consts, *planes, *planes)


def point_add_halves(fdeg: int, planes):
    """sum of contiguous halves: planes (3*fdeg x (16, n)) ->
    (3*fdeg x (16, n/2)).  Fast path for the MSM upsweep tree; requires
    n/2 to be a lane-tileable width (callers guard n >= 256)."""
    n = planes[0].shape[1]
    return _padd_halves_soa(fdeg, n, *planes)


def point_add_planes(fdeg: int, p_planes, q_planes):
    """Fused complete add directly on SoA plane tuples (3*fdeg arrays of
    (16, n) u32) -- the kernel's native layout, zero conversions.  Used
    by the MSM hot path (msm/pippenger)."""
    n = p_planes[0].shape[1]
    n_pad = _padded_lanes(n)
    ins = [_pad_lanes(pl_, n, n_pad) for pl_ in (*p_planes, *q_planes)]
    outs = _padd_soa(fdeg, n_pad, *ins)
    return tuple(o[:, :n] for o in outs)


def point_add(fops, p, q):
    """Fused complete add; drop-in for jaxcurve.point_add on (N,)-batched
    pytrees.  fops: jaxcurve.FQ_OPS or FQ2_OPS."""
    n = p[0].shape[0]
    n_pad = _padded_lanes(n)
    ins = []
    for pt in (p, q):
        for c in pt:
            ins.extend(_pad_lanes(pl_, n, n_pad) for pl_ in _soa(fops, c))
    outs = _padd_soa(fops.deg, n_pad, *ins)
    return tuple(c[:n] for c in _unpack_point(fops, outs))


def point_double(fops, p):
    n = p[0].shape[0]
    n_pad = _padded_lanes(n)
    ins = []
    for c in p:
        ins.extend(_pad_lanes(pl_, n, n_pad) for pl_ in _soa(fops, c))
    outs = _pdouble_soa(fops.deg, n_pad, *ins)
    return tuple(c[:n] for c in _unpack_point(fops, outs))
