"""Known-answer tests for the host golden-model field tower (BN254)."""

import random

from zklaim_tpu.ff.hostfield import Fq, Fq2, Fq6, Fq12, batch_inverse
from zklaim_tpu.ff.params import (
    FR_CAPACITY,
    Q,
    R,
    ROOT_OF_UNITY,
    TWO_ADICITY,
    Q_PINV16,
    Q_R_MOD,
)


def test_params_sanity():
    assert Q % 2 == 1 and R % 2 == 1
    assert pow(ROOT_OF_UNITY, 1 << TWO_ADICITY, R) == 1
    assert pow(ROOT_OF_UNITY, 1 << (TWO_ADICITY - 1), R) == R - 1
    assert FR_CAPACITY == 253
    # Montgomery constants
    assert (Q * ((-pow(Q, -1, 1 << 16)) % (1 << 16))) % (1 << 16) == (-1) % (1 << 16)
    assert Q_PINV16 == (-pow(Q, -1, 1 << 16)) % (1 << 16)
    assert Q_R_MOD == (1 << 256) % Q


def test_fq_ops():
    rnd = random.Random(1)
    for _ in range(50):
        a, b = rnd.randrange(Q), rnd.randrange(Q)
        assert (Fq(a) + Fq(b)).v == (a + b) % Q
        assert (Fq(a) - Fq(b)).v == (a - b) % Q
        assert (Fq(a) * Fq(b)).v == (a * b) % Q
        assert Fq(a).square().v == (a * a) % Q
        if a:
            assert (Fq(a) * Fq(a).inverse()).v == 1


def test_fq2_field_axioms():
    rnd = random.Random(2)
    for _ in range(30):
        a = Fq2(rnd.randrange(Q), rnd.randrange(Q))
        b = Fq2(rnd.randrange(Q), rnd.randrange(Q))
        c = Fq2(rnd.randrange(Q), rnd.randrange(Q))
        assert a * (b + c) == a * b + a * c
        assert a * b == b * a
        assert (a * b) * c == a * (b * c)
        assert a.square() == a * a
        if not a.is_zero():
            assert a * a.inverse() == Fq2.ONE
    # u^2 = -1
    u = Fq2(0, 1)
    assert u * u == Fq2(Q - 1, 0)


def test_fq2_frobenius_is_qth_power():
    rnd = random.Random(3)
    a = Fq2(rnd.randrange(Q), rnd.randrange(Q))
    assert a.frobenius() == a.pow(Q)


def test_fq6_axioms_and_nonresidue():
    rnd = random.Random(4)

    def rand6():
        return Fq6(
            Fq2(rnd.randrange(Q), rnd.randrange(Q)),
            Fq2(rnd.randrange(Q), rnd.randrange(Q)),
            Fq2(rnd.randrange(Q), rnd.randrange(Q)),
        )

    for _ in range(10):
        a, b, c = rand6(), rand6(), rand6()
        assert a * (b + c) == a * b + a * c
        assert (a * b) * c == a * (b * c)
        if not a.is_zero():
            assert a * a.inverse() == Fq6.ONE
    # v^3 = xi
    v = Fq6(Fq2.ZERO, Fq2.ONE, Fq2.ZERO)
    xi = Fq6(Fq2(9, 1), Fq2.ZERO, Fq2.ZERO)
    assert v * v * v == xi
    # mul_by_nonresidue == multiplication by v
    a = rand6()
    assert a.mul_by_nonresidue() == a * v


def test_fq12_axioms():
    rnd = random.Random(5)

    def rand12():
        def r2():
            return Fq2(rnd.randrange(Q), rnd.randrange(Q))

        return Fq12(Fq6(r2(), r2(), r2()), Fq6(r2(), r2(), r2()))

    for _ in range(5):
        a, b, c = rand12(), rand12(), rand12()
        assert a * (b + c) == a * b + a * c
        assert (a * b) * c == a * (b * c)
        assert a.square() == a * a
        assert a * a.inverse() == Fq12.ONE
    # conjugate is the q^6 power map
    a = rand12()
    assert a.conjugate() == a.pow(Q**6)
    # pow laws
    assert a.pow(3) == a * a * a


def test_batch_inverse():
    rnd = random.Random(6)
    vals = [rnd.randrange(1, Q) for _ in range(20)]
    invs = batch_inverse(vals, Q)
    for v, iv in zip(vals, invs):
        assert (v * iv) % Q == 1


def test_fq12_frobenius_and_cyclotomic(rng):
    """frobenius == generic q-power; GS squaring == generic square in
    the cyclotomic subgroup; pow_cyclotomic == pow."""
    from zklaim_tpu.ff.params import Q

    def rand12():
        return Fq12(
            Fq6(*[Fq2(rng.randrange(Q), rng.randrange(Q)) for _ in range(3)]),
            Fq6(*[Fq2(rng.randrange(Q), rng.randrange(Q)) for _ in range(3)]),
        )

    f = rand12()
    assert Fq12.from_flat(f.to_flat()) == f
    assert f.frobenius() == f.pow(Q)
    cyc = f.conjugate() * f.inverse()
    cyc = cyc.frobenius().frobenius() * cyc
    assert cyc * cyc.conjugate() == Fq12.ONE     # conj == inverse there
    assert cyc.cyclotomic_square() == cyc.square()
    e = rng.randrange(1 << 80)
    assert cyc.pow_cyclotomic(e) == cyc.pow(e)


def test_fq12flat_matches_tower(rng):
    """Every fq12flat op == the corresponding tower-class op."""
    from zklaim_tpu.ff import fq12flat as F
    from zklaim_tpu.ff.params import Q

    def rand12():
        return Fq12(
            Fq6(*[Fq2(rng.randrange(Q), rng.randrange(Q)) for _ in range(3)]),
            Fq6(*[Fq2(rng.randrange(Q), rng.randrange(Q)) for _ in range(3)]),
        )

    a, b = rand12(), rand12()
    fa, fb = F.from_fq12(a), F.from_fq12(b)
    assert F.to_fq12(fa) == a
    assert F.to_fq12(F.f_mul(fa, fb)) == a * b
    assert F.to_fq12(F.f_sqr(fa)) == a.square()
    assert F.to_fq12(F.f_conj(fa)) == a.conjugate()
    assert F.to_fq12(F.f_frob(fa)) == a.frobenius()
    assert F.f_is_one(F.from_fq12(Fq12.ONE))
    cyc = a.conjugate() * a.inverse()
    cyc = cyc.frobenius().frobenius() * cyc
    fc = F.from_fq12(cyc)
    assert F.to_fq12(F.f_cyc_sqr(fc)) == cyc.square()
    e = rng.randrange(1 << 64)
    assert F.to_fq12(F.f_pow_cyc(fc, e)) == cyc.pow(e)
    assert F.to_fq12(F.f_pow_cyc(fc, -e)) == cyc.pow(e).conjugate()
