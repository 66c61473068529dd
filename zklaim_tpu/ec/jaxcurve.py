"""Batched Jacobian elliptic-curve arithmetic on TPU (BN254 G1 and G2).

Points are pytrees (X, Y, Z) of Montgomery-domain limb arrays; G1
coordinates are Fq elements of shape (..., 16), G2 coordinates are Fq2
elements of shape (..., 2, 16).  Infinity is encoded as Z == 0.

The group law is a branchless *unified* add: both the generic-add and the
doubling formulas are evaluated and the correct result is selected with
masks (equal points -> double; opposite -> infinity; either operand at
infinity -> the other).  This makes the op safe as an associative-scan /
reduction combiner in the MSM kernels, where operand equality is data-
dependent.

Independent field multiplications inside a formula are stacked into single
mont_mul calls ("stage batching"): fewer HLO ops per point-add (compile
time) and wider elementwise kernels at runtime.

TPU-native replacement for libff alt_bn128_G1/G2 Jacobian arithmetic
(SURVEY.md §2.6 rows 1-2).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ff import montgomery as M
from ..ff.limbs import NUM_LIMBS
from ..ff.montgomery import FQ
from .hostcurve import B_G1, B_G2, CurvePoint, g1_generator, g2_generator
from ..ff.hostfield import Fq, Fq2
from ..ff.params import MONT_R, Q


# ---------------------------------------------------------------------------
# Field-ops namespaces (degree-1 Fq and degree-2 Fq2), jit-static singletons
# ---------------------------------------------------------------------------


class FqOps:
    """Fq elements: (..., 16) Montgomery-domain uint32 limbs."""

    name = "fq"
    deg = 1

    @staticmethod
    def add(a, b):
        return M.add_mod(FQ, a, b)

    @staticmethod
    def sub(a, b):
        return M.sub_mod(FQ, a, b)

    @staticmethod
    def neg(a):
        return M.neg_mod(FQ, a)

    @staticmethod
    def dbl(a):
        return M.add_mod(FQ, a, a)

    @staticmethod
    def mul(a, b):
        return M.mont_mul(FQ, a, b)

    @staticmethod
    def sqr(a):
        return M.mont_mul(FQ, a, a)

    @staticmethod
    def mul_many(pairs):
        """Stack independent products into one mont_mul call."""
        lhs = jnp.stack([p[0] for p in pairs], axis=0)
        rhs = jnp.stack([p[1] for p in pairs], axis=0)
        out = M.mont_mul(FQ, lhs, rhs)
        return [out[i] for i in range(len(pairs))]

    @staticmethod
    def inv(a):
        return M.mont_inv(FQ, a)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=-1)

    @staticmethod
    def select(mask, a, b):
        """mask: (...,) bool; a, b: (..., 16)."""
        return jnp.where(mask[..., None], a, b)

    @staticmethod
    def zeros(batch_shape):
        return jnp.zeros(batch_shape + (NUM_LIMBS,), dtype=jnp.uint32)

    @staticmethod
    def ones(batch_shape):
        return jnp.broadcast_to(
            jnp.asarray(FQ.one_mont, dtype=jnp.uint32), batch_shape + (NUM_LIMBS,)
        )


class Fq2Ops:
    """Fq2 elements: (..., 2, 16) Montgomery-domain uint32 limbs."""

    name = "fq2"
    deg = 2

    # component-wise ops reuse the Fq kernels (they are elementwise in limbs)
    @staticmethod
    def add(a, b):
        return M.add_mod(FQ, a, b)

    @staticmethod
    def sub(a, b):
        return M.sub_mod(FQ, a, b)

    @staticmethod
    def neg(a):
        return M.neg_mod(FQ, a)

    @staticmethod
    def dbl(a):
        return M.add_mod(FQ, a, a)

    @staticmethod
    def mul(a, b):
        return Fq2Ops.mul_many([(a, b)])[0]

    @staticmethod
    def sqr(a):
        return Fq2Ops.mul(a, a)

    @staticmethod
    def mul_many(pairs):
        """Karatsuba over Fq, all pairs stacked into a single mont_mul.

        For each (a, b): t0 = a0 b0, t1 = a1 b1, t2 = (a0+a1)(b0+b1);
        c0 = t0 - t1,  c1 = t2 - t0 - t1.
        """
        lhs, rhs = [], []
        for a, b in pairs:
            a0, a1 = a[..., 0, :], a[..., 1, :]
            b0, b1 = b[..., 0, :], b[..., 1, :]
            lhs += [a0, a1, M.add_mod(FQ, a0, a1)]
            rhs += [b0, b1, M.add_mod(FQ, b0, b1)]
        prod = M.mont_mul(FQ, jnp.stack(lhs, 0), jnp.stack(rhs, 0))
        out = []
        for i in range(len(pairs)):
            t0, t1, t2 = prod[3 * i], prod[3 * i + 1], prod[3 * i + 2]
            c0 = M.sub_mod(FQ, t0, t1)
            c1 = M.sub_mod(FQ, M.sub_mod(FQ, t2, t0), t1)
            out.append(jnp.stack([c0, c1], axis=-2))
        return out

    @staticmethod
    def inv(a):
        a0, a1 = a[..., 0, :], a[..., 1, :]
        sq = M.mont_mul(FQ, jnp.stack([a0, a1], 0), jnp.stack([a0, a1], 0))
        norm = M.add_mod(FQ, sq[0], sq[1])
        ninv = M.mont_inv(FQ, norm)
        c = M.mont_mul(FQ, jnp.stack([a0, a1], 0), jnp.stack([ninv, ninv], 0))
        return jnp.stack([c[0], M.neg_mod(FQ, c[1])], axis=-2)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=(-1, -2))

    @staticmethod
    def select(mask, a, b):
        return jnp.where(mask[..., None, None], a, b)

    @staticmethod
    def zeros(batch_shape):
        return jnp.zeros(batch_shape + (2, NUM_LIMBS), dtype=jnp.uint32)

    @staticmethod
    def ones(batch_shape):
        one = np.zeros((2, NUM_LIMBS), dtype=np.uint32)
        one[0] = FQ.one_mont
        return jnp.broadcast_to(jnp.asarray(one), batch_shape + (2, NUM_LIMBS))


FQ_OPS = FqOps()
FQ2_OPS = Fq2Ops()


# ---------------------------------------------------------------------------
# Jacobian group law (branchless unified add + dedicated double)
# ---------------------------------------------------------------------------


def point_infinity(f, batch_shape=()):
    return (f.ones(batch_shape), f.ones(batch_shape), f.zeros(batch_shape))


def point_neg(f, p):
    x, y, z = p
    return (x, f.neg(y), z)


def point_select(f, mask, p, q):
    """mask True -> p, False -> q (batched)."""
    return tuple(f.select(mask, a, b) for a, b in zip(p, q))


def point_is_inf(f, p):
    return f.is_zero(p[2])


def point_double(f, p):
    """dbl-2009-l for a=0: safe for all inputs (Z=0 or Y=0 -> infinity)."""
    x1, y1, z1 = p
    xx, yy, y1z1 = f.mul_many([(x1, x1), (y1, y1), (y1, z1)])
    yyyy, s_half = f.mul_many([(yy, yy), (f.add(x1, yy), f.add(x1, yy))])
    # D = 2*((X+YY)^2 - XX - YYYY)
    d = f.dbl(f.sub(f.sub(s_half, xx), yyyy))
    e = f.add(f.dbl(xx), xx)  # 3 XX
    ff_ = f.mul(e, e)
    x3 = f.sub(ff_, f.dbl(d))
    y3 = f.sub(f.mul(e, f.sub(d, x3)), f.dbl(f.dbl(f.dbl(yyyy))))
    z3 = f.dbl(y1z1)
    return (x3, y3, z3)


def point_add(f, p1, p2):
    """Complete unified Jacobian add; correct for every input combination."""
    x1, y1, z1 = p1
    x2, y2, z2 = p2

    z1z1, z2z2, y1z2, y2z1 = f.mul_many([(z1, z1), (z2, z2), (y1, z2), (y2, z1)])
    u1, u2, s1, s2 = f.mul_many([(x1, z2z2), (x2, z1z1), (y1z2, z2z2), (y2z1, z1z1)])
    h = f.sub(u2, u1)
    r = f.sub(s2, s1)

    # generic-add path
    hh, rr, z1z2 = f.mul_many([(h, h), (r, r), (z1, z2)])
    hhh, u1hh, z3a = f.mul_many([(h, hh), (u1, hh), (z1z2, h)])
    x3a = f.sub(f.sub(rr, hhh), f.dbl(u1hh))
    t5, s1hhh = f.mul_many([(r, f.sub(u1hh, x3a)), (s1, hhh)])
    y3a = f.sub(t5, s1hhh)

    # doubling path
    xd, yd, zd = point_double(f, p1)

    p1_inf = point_is_inf(f, p1)
    p2_inf = point_is_inf(f, p2)
    both = jnp.logical_and(~p1_inf, ~p2_inf)
    h_zero = f.is_zero(h)
    r_zero = f.is_zero(r)
    eq = jnp.logical_and(both, jnp.logical_and(h_zero, r_zero))
    opp = jnp.logical_and(both, jnp.logical_and(h_zero, ~r_zero))

    x3 = f.select(eq, xd, x3a)
    y3 = f.select(eq, yd, y3a)
    z3 = f.select(eq, zd, z3a)
    # opposite points -> infinity
    z3 = f.select(opp, f.zeros(_batch_shape(f, z3)), z3)
    # operand at infinity -> the other operand
    out = (
        f.select(p1_inf, x2, f.select(p2_inf, x1, x3)),
        f.select(p1_inf, y2, f.select(p2_inf, y1, y3)),
        f.select(p1_inf, z2, f.select(p2_inf, z1, z3)),
    )
    return out


def _batch_shape(f, coord):
    """Leading batch shape of a coordinate array (strip field dims)."""
    return coord.shape[: coord.ndim - (1 if f.deg == 1 else 2)]


# ---------------------------------------------------------------------------
# Host <-> device conversion
# ---------------------------------------------------------------------------


def _fq_encode_many(vals):
    return M.encode_ints(FQ, vals)


def host_points_to_jac(f, points):
    """List of host CurvePoints (affine or inf) -> batched Jacobian arrays."""
    n = len(points)
    if f.deg == 1:
        xs, ys, zs = [], [], []
        for p in points:
            if p.inf:
                xs.append(1), ys.append(1), zs.append(0)
            else:
                xs.append(p.x.v), ys.append(p.y.v), zs.append(1)
        return (
            jnp.asarray(_fq_encode_many(xs)),
            jnp.asarray(_fq_encode_many(ys)),
            jnp.asarray(_fq_encode_many(zs)),
        )
    xs, ys, zs = [], [], []
    for p in points:
        if p.inf:
            xs += [1, 0]
            ys += [1, 0]
            zs += [0, 0]
        else:
            xs += [p.x.c0, p.x.c1]
            ys += [p.y.c0, p.y.c1]
            zs += [1, 0]
    shape = (n, 2, NUM_LIMBS)
    return (
        jnp.asarray(_fq_encode_many(xs)).reshape(shape),
        jnp.asarray(_fq_encode_many(ys)).reshape(shape),
        jnp.asarray(_fq_encode_many(zs)).reshape(shape),
    )


def jac_to_host_points(f, jac):
    """Batched Jacobian arrays -> list of host CurvePoints (exact)."""
    x_arr, y_arr, z_arr = (np.asarray(c) for c in jac)
    if f.deg == 1:
        xs = M.decode_ints(FQ, x_arr)
        ys = M.decode_ints(FQ, y_arr)
        zs = M.decode_ints(FQ, z_arr)
        out = []
        for x, y, z in zip(xs, ys, zs):
            if z == 0:
                out.append(CurvePoint.infinity(B_G1))
            else:
                zinv = pow(z, -1, Q)
                zi2 = zinv * zinv % Q
                out.append(CurvePoint(Fq(x * zi2 % Q), Fq(y * zi2 % Q * zinv % Q), B_G1))
        return out
    n = x_arr.shape[0]
    xs = M.decode_ints(FQ, x_arr.reshape(n * 2, NUM_LIMBS))
    ys = M.decode_ints(FQ, y_arr.reshape(n * 2, NUM_LIMBS))
    zs = M.decode_ints(FQ, z_arr.reshape(n * 2, NUM_LIMBS))
    out = []
    for i in range(n):
        z = Fq2(zs[2 * i], zs[2 * i + 1])
        if z.is_zero():
            out.append(CurvePoint.infinity(B_G2))
            continue
        x = Fq2(xs[2 * i], xs[2 * i + 1])
        y = Fq2(ys[2 * i], ys[2 * i + 1])
        zinv = z.inverse()
        zi2 = zinv.square()
        out.append(CurvePoint(x * zi2, y * zi2 * zinv, B_G2))
    return out
