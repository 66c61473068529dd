"""Tests for the host curve golden model and the ate pairing."""

import random

import pytest

from zklaim_tpu.ec.hostcurve import (
    g1_generator,
    g1_infinity,
    g2_generator,
    g2_infinity,
)
from zklaim_tpu.ec.pairing import pairing, pairing_product_is_one
from zklaim_tpu.ff.hostfield import Fq12
from zklaim_tpu.ff.params import R


def test_generators_on_curve():
    assert g1_generator().is_on_curve()
    assert g2_generator().is_on_curve()


def test_group_order():
    assert (g1_generator() * R) == g1_infinity()
    assert (g2_generator() * R) == g2_infinity()


def test_group_laws_g1():
    g = g1_generator()
    assert g + g == g.double()
    assert g.double() + g == g * 3
    assert g * 5 + g * 7 == g * 12
    assert (g * 5) - (g * 5) == g1_infinity()
    assert g + g1_infinity() == g


def test_group_laws_g2():
    g = g2_generator()
    assert g + g == g.double()
    assert g * 5 + g * 7 == g * 12
    assert (g * 3) - (g * 3) == g2_infinity()


def test_scalar_mul_random():
    rnd = random.Random(7)
    g = g1_generator()
    a, b = rnd.randrange(R), rnd.randrange(R)
    assert g * a + g * b == g * ((a + b) % R)


@pytest.mark.slow
def test_pairing_bilinearity():
    g1, g2 = g1_generator(), g2_generator()
    e = pairing(g1, g2)
    assert not e.is_one()  # non-degeneracy
    assert e.pow(R).is_one()  # lands in the r-torsion of Fq12*

    a, b = 6, 11
    lhs = pairing(g1 * a, g2 * b)
    assert lhs == e.pow(a * b)
    # linearity in each slot
    assert pairing(g1 * a, g2) == e.pow(a)
    assert pairing(g1, g2 * b) == e.pow(b)


@pytest.mark.slow
def test_pairing_product():
    g1, g2 = g1_generator(), g2_generator()
    # e(aG1, bG2) * e(-abG1, G2) == 1
    a, b = 9, 4
    assert pairing_product_is_one([(g1 * a, g2 * b), (-(g1 * (a * b)), g2)])
    assert not pairing_product_is_one([(g1 * a, g2 * b), (-(g1 * (a * b + 1)), g2)])


def test_pairing_infinity():
    assert pairing(g1_infinity(), g2_generator()) == Fq12.ONE
    assert pairing(g1_generator(), g2_infinity()) == Fq12.ONE


def test_fast_miller_matches_generic(rng):
    """The twisted-coordinate flat-int Miller loop == the all-Fq12
    golden formulation (pairing.py fast path vs *_generic)."""
    from zklaim_tpu.ec.pairing import (
        final_exponentiation,
        final_exponentiation_generic,
        miller_loop,
        miller_loop_generic,
    )

    p1 = g1_generator() * rng.randrange(1, R)
    q2 = g2_generator() * rng.randrange(1, R)
    ml_fast = miller_loop(q2, p1)
    ml_gold = miller_loop_generic(q2, p1)
    assert ml_fast == ml_gold
    assert final_exponentiation(ml_fast) == final_exponentiation_generic(
        ml_gold
    )


def test_multi_miller_is_product_of_millers(rng):
    from zklaim_tpu.ec.pairing import miller_loop, miller_loop_multi

    pairs = [
        (g1_generator() * rng.randrange(1, R),
         g2_generator() * rng.randrange(1, R))
        for _ in range(3)
    ]
    prod = Fq12.ONE
    for p, q in pairs:
        prod = prod * miller_loop(q, p)
    assert miller_loop_multi(pairs) == prod
    # infinity pairs are skipped (contribute 1)
    assert miller_loop_multi(pairs + [(g1_infinity(), g2_generator())]) == prod
