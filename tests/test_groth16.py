"""Groth16 E2E on a tiny circuit: setup -> prove -> verify + negative paths."""

import pytest

# Device-kernel module: jit compiles of wide-limb graphs dominate
# cold runs; excluded from the fast CI suite (make test-fast).
pytestmark = pytest.mark.slow

import random

import pytest

from zklaim_tpu.ff.params import R
from zklaim_tpu.gadgets.compare import comparison
from zklaim_tpu.groth16.api import Proof, prove, setup, verify
from zklaim_tpu.r1cs.system import LC, ONE, ZERO, ConstraintSystem


def factor_circuit():
    """Public z; witness x, y with x*y = z and x < y (8-bit)."""
    cs = ConstraintSystem()
    z = cs.alloc_lc()
    cs.mark_primary_end()
    x = cs.alloc_lc()
    y = cs.alloc_lc()
    cs.constrain(x, y, z, "x*y=z")
    less, _le = comparison(cs, 8, x, y, "x<y")
    cs.enforce_equal(less, ONE, "x<y holds")
    return cs, z, x, y


def witness_for(cs, x, y, xv, yv):
    xi, yi = next(iter(x.terms)), next(iter(y.terms))
    zi = 1  # z is the first allocated var

    def hook(w):
        w[xi], w[yi] = xv, yv
        w[zi] = xv * yv % R

    cs.hooks.insert(0, hook)
    return cs.generate_witness()


@pytest.fixture(scope="module")
def keys():
    cs, z, x, y = factor_circuit()
    w = witness_for(cs, x, y, 6, 7)
    pk, vk, qap = setup(cs, random.Random(42))
    return cs, w, pk, vk, qap


def test_setup_prove_verify_roundtrip(keys):
    cs, w, pk, vk, qap = keys
    proof = prove(pk, qap, w, random.Random(43))
    assert verify(vk, [42], proof)


def test_verify_rejects_wrong_public_input(keys):
    cs, w, pk, vk, qap = keys
    proof = prove(pk, qap, w, random.Random(44))
    assert not verify(vk, [41], proof)
    assert not verify(vk, [], proof)
    assert not verify(vk, [42, 1], proof)


def test_verify_rejects_tampered_proof(keys):
    cs, w, pk, vk, qap = keys
    proof = prove(pk, qap, w, random.Random(45))
    bad = Proof(a=proof.a + proof.a, b=proof.b, c=proof.c)
    assert not verify(vk, [42], bad)
    bad2 = Proof(a=proof.a, b=proof.b, c=proof.c + proof.c)
    assert not verify(vk, [42], bad2)


def test_prover_rejects_unsatisfied_witness(keys):
    cs, w, pk, vk, qap = keys
    bad_w = list(w)
    bad_w[1] = (bad_w[1] + 1) % R  # break x*y = z
    with pytest.raises(ValueError):
        prove(pk, qap, bad_w, random.Random(46))


def test_proof_randomization_differs(keys):
    """Two proofs of the same statement differ (r, s randomness) yet verify."""
    cs, w, pk, vk, qap = keys
    p1 = prove(pk, qap, w, random.Random(47))
    p2 = prove(pk, qap, w, random.Random(48))
    assert p1.a != p2.a
    assert verify(vk, [42], p1) and verify(vk, [42], p2)
