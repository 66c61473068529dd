"""Host-side (Python int) elliptic-curve golden model for BN254 G1/G2.

Generic short-Weierstrass arithmetic over any field of the zklaim_tpu.ff
tower (Fq, Fq2, Fq12).  This is the exactness reference for the batched
TPU point kernels (zklaim_tpu/ec/jaxcurve.py) and the production path for
single-point work (generator table construction, verification).

Replaces libff's alt_bn128_G1/alt_bn128_G2 used by the reference through
libsnark (SURVEY.md L1; reference links libff per zklaim/compileMe.txt:2-4).
"""

from __future__ import annotations

from ..ff.hostfield import Fq, Fq2, Fq6, Fq12, XI_FQ2
from ..ff.params import G1_B, G1_GEN, G2_GEN_X, G2_GEN_Y, Q, R


class CurvePoint:
    """Affine point (or infinity) on y^2 = x^3 + b over a generic field.

    Affine representation keeps the golden model dead simple; performance-
    critical batched arithmetic lives on the TPU side in Jacobian form.
    """

    __slots__ = ("x", "y", "inf", "b")

    def __init__(self, x, y, b, inf=False):
        self.x, self.y, self.b, self.inf = x, y, b, inf

    @classmethod
    def infinity(cls, b):
        return cls(None, None, b, inf=True)

    def __eq__(self, o):
        if self.inf or o.inf:
            return self.inf and o.inf
        return self.x == o.x and self.y == o.y

    def __repr__(self):
        return "Inf" if self.inf else f"({self.x}, {self.y})"

    def is_on_curve(self):
        if self.inf:
            return True
        return self.y.square() == self.x.square() * self.x + self.b

    def __neg__(self):
        if self.inf:
            return self
        return CurvePoint(self.x, -self.y, self.b)

    def __add__(self, o):
        if self.inf:
            return o
        if o.inf:
            return self
        if self.x == o.x:
            if self.y == o.y:
                return self.double()
            return CurvePoint.infinity(self.b)
        lam = (o.y - self.y) * (o.x - self.x).inverse()
        x3 = lam.square() - self.x - o.x
        y3 = lam * (self.x - x3) - self.y
        return CurvePoint(x3, y3, self.b)

    def __sub__(self, o):
        return self + (-o)

    def double(self):
        if self.inf or self.y.is_zero():
            return CurvePoint.infinity(self.b)
        lam = (self.x.square() * 3) * (self.y + self.y).inverse()
        x3 = lam.square() - self.x - self.x
        y3 = lam * (self.x - x3) - self.y
        return CurvePoint(x3, y3, self.b)

    def mul(self, k: int):
        return self.mul_raw(k % R)

    def mul_raw(self, k: int):
        """Scalar multiply WITHOUT reducing k mod the group order.

        mul() assumes r-order points (the normal case); subgroup checks
        (is r*P == inf?) need the unreduced ladder or the test is
        vacuous."""
        result = CurvePoint.infinity(self.b)
        addend = self
        while k:
            if k & 1:
                result = result + addend
            addend = addend.double()
            k >>= 1
        return result

    __mul__ = mul
    __rmul__ = mul


# curve coefficients
B_G1 = Fq(G1_B)
B_G2 = Fq2(G1_B, 0) * XI_FQ2.inverse()  # b' = b / xi  (D-type twist)


def g1_generator() -> CurvePoint:
    return CurvePoint(Fq(G1_GEN[0]), Fq(G1_GEN[1]), B_G1)


def g2_generator() -> CurvePoint:
    return CurvePoint(Fq2(*G2_GEN_X), Fq2(*G2_GEN_Y), B_G2)


def g1_point(x: int, y: int) -> CurvePoint:
    return CurvePoint(Fq(x), Fq(y), B_G1)


def g1_infinity() -> CurvePoint:
    return CurvePoint.infinity(B_G1)


def g2_infinity() -> CurvePoint:
    return CurvePoint.infinity(B_G2)


# ---------------------------------------------------------------------------
# Embedding into E(Fq12) for the pairing (untwist map)
# ---------------------------------------------------------------------------

# w^2 = v in Fq6 coords: w2 = (0, 1, 0) as Fq6, embedded at c0 of Fq12
_W2 = Fq12(Fq6(Fq2.ZERO, Fq2.ONE, Fq2.ZERO), Fq6.ZERO)         # w^2
_W3 = Fq12(Fq6.ZERO, Fq6(Fq2.ZERO, Fq2.ONE, Fq2.ZERO))         # w^3
B_FQ12 = Fq12(Fq6(Fq2(G1_B, 0), Fq2.ZERO, Fq2.ZERO), Fq6.ZERO)


def fq2_to_fq12(a: Fq2) -> Fq12:
    return Fq12(Fq6(a, Fq2.ZERO, Fq2.ZERO), Fq6.ZERO)


def fq_to_fq12(a: Fq) -> Fq12:
    return fq2_to_fq12(Fq2(a.v, 0))


def untwist(p: CurvePoint) -> CurvePoint:
    """psi: E'(Fq2) -> E(Fq12), (x', y') -> (x' w^2, y' w^3).

    (y' w^3)^2 = y'^2 xi w^... : since w^6 = xi, psi lands on y^2 = x^3 + b.
    """
    if p.inf:
        return CurvePoint.infinity(B_FQ12)
    return CurvePoint(fq2_to_fq12(p.x) * _W2, fq2_to_fq12(p.y) * _W3, B_FQ12)


def g1_to_fq12(p: CurvePoint) -> CurvePoint:
    if p.inf:
        return CurvePoint.infinity(B_FQ12)
    return CurvePoint(fq_to_fq12(p.x), fq_to_fq12(p.y), B_FQ12)
