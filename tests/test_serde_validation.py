"""Deserialized group elements are validated (on-curve, range, subgroup).

The reference gets this from libff's stream operator>> underneath
libsnark_import_{pk,vk,proof} (zklaim/libsnark_wrapper.cpp:140-192);
accepting off-curve/wrong-subgroup proof points is a Groth16 soundness
break.  Malformed bytes must map to SerdeError / status codes, never
crash (zklaim.c:354-358 error-code convention).
"""

import pytest

from zklaim_tpu.claims import serde
from zklaim_tpu.claims.api import Context
from zklaim_tpu.ec.hostcurve import (
    B_G2, CurvePoint, g1_generator, g2_generator,
)
from zklaim_tpu.ff.hostfield import Fq2
from zklaim_tpu.ff.params import Q, R


def _valid_proof_bytes():
    return (
        serde.MAGIC_PF
        + serde.g1_point_to_bytes(g1_generator())
        + serde.g2_point_to_bytes(g2_generator())
        + serde.g1_point_to_bytes(g1_generator() * 5)
    )


def test_valid_proof_roundtrip():
    p = serde.proof_from_bytes(_valid_proof_bytes())
    assert p.a == g1_generator()
    assert p.b == g2_generator()


def test_g1_off_curve_rejected():
    raw = (1).to_bytes(32, "big") + (1).to_bytes(32, "big")
    with pytest.raises(serde.SerdeError, match="not on curve"):
        serde.g1_point_from_bytes(raw)


def test_g1_out_of_range_rejected():
    raw = Q.to_bytes(32, "big") + (1).to_bytes(32, "big")
    with pytest.raises(serde.SerdeError, match="out of range"):
        serde.g1_point_from_bytes(raw)


def _fq2_sqrt(a: Fq2):
    """sqrt in Fq2 = Fq[u]/(u^2+1) via the norm trick (q = 3 mod 4)."""
    e = (Q + 1) // 4

    def fq_sqrt(v):
        s = pow(v, e, Q)
        return s if s * s % Q == v % Q else None

    n = (a.c0 * a.c0 + a.c1 * a.c1) % Q
    lam = fq_sqrt(n)
    if lam is None:
        return None
    for sign in (1, Q - 1):
        half = (a.c0 + sign * lam) * pow(2, -1, Q) % Q
        x0 = fq_sqrt(half)
        if x0 is None:
            continue
        x1 = a.c1 * pow(2 * x0, -1, Q) % Q
        cand = Fq2(x0, x1)
        if cand * cand == a:
            return cand
    return None


def _g2_point_outside_subgroup():
    """A point on E'(Fq2) that is (with overwhelming probability) not in
    the r-order subgroup: solve y^2 = x^3 + b' for successive x."""
    x = Fq2(1, 0)
    one = Fq2(1, 0)
    while True:
        rhs = x * x * x + B_G2
        y = _fq2_sqrt(rhs)
        if y is not None:
            p = CurvePoint(x, y, B_G2)
            assert p.is_on_curve()
            if not p.mul_raw(R).inf:
                return p
        x = x + one


def test_g2_wrong_subgroup_rejected():
    p = _g2_point_outside_subgroup()
    raw = serde.g2_point_to_bytes(p)
    with pytest.raises(serde.SerdeError, match="subgroup"):
        serde.g2_point_from_bytes(raw)


def test_g2_off_curve_rejected():
    raw = (1).to_bytes(32, "big") * 4
    with pytest.raises(serde.SerdeError, match="not on curve|subgroup"):
        serde.g2_point_from_bytes(raw)


def test_g1_batch_off_curve_rejected():
    good = serde.g1_point_to_bytes(g1_generator())
    bad = (1).to_bytes(32, "big") + (1).to_bytes(32, "big")
    with pytest.raises(serde.SerdeError, match="not on curve"):
        serde.g1_batch_from_bytes(good + bad, 2)


def test_g1_batch_out_of_range_rejected():
    bad = Q.to_bytes(32, "big") + (1).to_bytes(32, "big")
    with pytest.raises(serde.SerdeError, match="out of range"):
        serde.g1_batch_from_bytes(bad, 1)


def test_proof_mutation_fuzz(rng):
    """Random byte mutations of a proof: parse either succeeds or raises
    SerdeError -- never any other exception."""
    base = bytearray(_valid_proof_bytes())
    for _ in range(200):
        mutated = bytearray(base)
        for _ in range(rng.randrange(1, 4)):
            mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        try:
            serde.proof_from_bytes(bytes(mutated))
        except serde.SerdeError:
            pass


def test_ctx_verify_never_raises_on_garbage(rng):
    """Context.proof_verify returns 1 (invalid) on malformed vk/proof."""
    ctx = Context()
    ctx.vk = b"garbage-vk-bytes"
    ctx.proof = b"\x00" * 260
    assert ctx.proof_verify() == 1
    ctx.proof = _valid_proof_bytes()
    assert ctx.proof_verify() == 1          # vk still garbage
    ctx.vk = serde.MAGIC_VK + b"\x01\x00\x00\x00" + b"\x00" * 100
    assert ctx.proof_verify() == 1          # truncated vk body
