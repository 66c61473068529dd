"""Optimal ate pairing on BN254 (host-side, exact Python int arithmetic).

The verifier's pairing-product check is inherently scalar, latency-bound
work (4 pairings per Groth16 verification) and is therefore implemented on
the host, while the throughput-bound primitives (MSM, NTT) run on TPU.

Design choice: the Miller loop runs entirely in E(Fq12) via the untwist
embedding psi(x', y') = (x' w^2, y' w^3).  This trades a constant factor in
host speed for a construction whose only trust anchors are the tower
definition and the curve equation -- every Frobenius is a computed q-power,
no transcribed endomorphism coefficients anywhere.

Replaces libff's alt_bn128 ate pairing (miller loop + final exponentiation)
used by the reference through libsnark's r1cs_gg_ppzksnark verifier
(reference call site: zklaim/snark.cpp:62).
"""

from __future__ import annotations

from ..ff.hostfield import Fq12
from ..ff.params import ATE_LOOP_COUNT, Q, R
from .hostcurve import CurvePoint, fq_to_fq12, g1_to_fq12, untwist

# exponents of the final exponentiation, computed once
_EASY2_EXP = Q * Q
_HARD_EXP = (Q**4 - Q**2 + 1) // R
assert (Q**4 - Q**2 + 1) % R == 0


def _frobenius_point(p: CurvePoint) -> CurvePoint:
    """q-power Frobenius endomorphism on E(Fq12)."""
    if p.inf:
        return p
    return CurvePoint(p.x.pow(Q), p.y.pow(Q), p.b)


def _line(a: CurvePoint, b: CurvePoint, xp: Fq12, yp: Fq12) -> Fq12:
    """Evaluate the line through points a, b of E(Fq12) at (xp, yp)."""
    if a.inf or b.inf:
        return Fq12.ONE
    if a.x == b.x:
        if a.y == b.y and not a.y.is_zero():
            xx = a.x.square()
            lam = (xx + xx + xx) * (a.y + a.y).inverse()
        else:
            # vertical line
            return xp - a.x
    else:
        lam = (b.y - a.y) * (b.x - a.x).inverse()
    return (yp - a.y) - lam * (xp - a.x)


def miller_loop(q_twisted: CurvePoint, p_g1: CurvePoint) -> Fq12:
    """Optimal ate Miller loop: f_{6x+2,Q}(P) with the two Frobenius lines."""
    if q_twisted.inf or p_g1.inf:
        return Fq12.ONE

    qq = untwist(q_twisted)
    pp = g1_to_fq12(p_g1)
    xp, yp = pp.x, pp.y

    f = Fq12.ONE
    t = qq
    for i in range(ATE_LOOP_COUNT.bit_length() - 2, -1, -1):
        f = f.square() * _line(t, t, xp, yp)
        t = t.double()
        if (ATE_LOOP_COUNT >> i) & 1:
            f = f * _line(t, qq, xp, yp)
            t = t + qq

    q1 = _frobenius_point(qq)
    q2 = _frobenius_point(q1)
    f = f * _line(t, q1, xp, yp)
    t = t + q1
    f = f * _line(t, -q2, xp, yp)
    return f


def final_exponentiation(f: Fq12) -> Fq12:
    """f^((q^12 - 1) / r), via the standard easy/hard split."""
    # easy part: f^(q^6 - 1) then ^(q^2 + 1)
    f1 = f.conjugate() * f.inverse()
    f2 = f1.pow(_EASY2_EXP) * f1
    # hard part (generic square-and-multiply; exact by construction)
    return f2.pow(_HARD_EXP)


def pairing(p_g1: CurvePoint, q_g2: CurvePoint) -> Fq12:
    """e(P, Q) for P in G1(Fq), Q in G2 (twisted coordinates over Fq2)."""
    return final_exponentiation(miller_loop(q_g2, p_g1))


def pairing_product_is_one(pairs) -> bool:
    """Check prod e(P_i, Q_i) == 1 with a single shared final exponentiation."""
    acc = Fq12.ONE
    for p_g1, q_g2 in pairs:
        acc = acc * miller_loop(q_g2, p_g1)
    return final_exponentiation(acc).is_one()
