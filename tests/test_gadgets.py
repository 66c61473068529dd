"""Gadget library: truth tables, comparison semantics, SHA256 vs hashlib."""

import hashlib
import itertools

import pytest

from zklaim_tpu.ff.params import R
from zklaim_tpu.gadgets import bits as B
from zklaim_tpu.gadgets.compare import comparison
from zklaim_tpu.gadgets.sha256 import (
    sha256_48byte_block_bits,
    sha256_compression,
)
from zklaim_tpu.r1cs.system import LC, ConstraintSystem


def set_inputs(cs, lcs, values):
    idxs = [next(iter(lc.terms)) for lc in lcs]

    def hook(w, idxs=idxs, values=list(values)):
        for i, v in zip(idxs, values):
            w[i] = v

    cs.add_hook(hook)


@pytest.mark.parametrize("op,fn", [
    ("xor", lambda a, b: a ^ b),
    ("and", lambda a, b: a & b),
])
def test_binary_ops(op, fn):
    for a, b in itertools.product([0, 1], repeat=2):
        cs = ConstraintSystem()
        ia, ib = B.alloc_input_bits(cs, 2)
        set_inputs(cs, [ia, ib], [a, b])
        out = (B.bxor if op == "xor" else B.band)(cs, ia, ib)
        w = cs.generate_witness()
        assert cs.is_satisfied(w), (op, a, b)
        assert out.eval(w) == fn(a, b)


def test_ch_maj():
    for e, f, g in itertools.product([0, 1], repeat=3):
        cs = ConstraintSystem()
        ie, if_, ig = B.alloc_input_bits(cs, 3)
        set_inputs(cs, [ie, if_, ig], [e, f, g])
        c = B.ch(cs, ie, if_, ig)
        m = B.maj(cs, ie, if_, ig)
        w = cs.generate_witness()
        assert cs.is_satisfied(w)
        assert c.eval(w) == ((e & f) ^ ((1 - e) & g))
        assert m.eval(w) == (1 if e + f + g >= 2 else 0)


def test_constant_folding_costs_nothing():
    cs = ConstraintSystem()
    (ia,) = B.alloc_input_bits(cs, 1)
    n0 = cs.num_constraints
    assert B.bxor(cs, ia, LC.const(0)).terms == ia.terms
    out = B.bxor(cs, ia, LC.const(1))
    B.band(cs, ia, LC.const(0))
    B.ch(cs, LC.const(1), ia, LC.const(0))
    assert cs.num_constraints == n0


def test_decompose_roundtrip():
    cs = ConstraintSystem()
    v = cs.alloc_lc()
    set_inputs(cs, [v], [12345678901234])
    bits = B.decompose(cs, v, 48)
    w = cs.generate_witness()
    assert cs.is_satisfied(w)
    assert sum(b.eval(w) << i for i, b in enumerate(bits)) == 12345678901234


@pytest.mark.parametrize("a,b", [
    (0, 0), (1, 0), (0, 1), (5, 5),
    (2**64 - 1, 2**64 - 1), (2**64 - 1, 0), (0, 2**64 - 1),
    (12345, 54321), (54321, 12345),
])
def test_comparison_64(a, b):
    cs = ConstraintSystem()
    va, vb = cs.alloc_lc(), cs.alloc_lc()
    set_inputs(cs, [va, vb], [a, b])
    less, le = comparison(cs, 64, va, vb)
    w = cs.generate_witness()
    assert cs.is_satisfied(w)
    assert less.eval(w) == (1 if a < b else 0)
    assert le.eval(w) == (1 if a <= b else 0)


def test_comparison_rejects_bad_witness():
    cs = ConstraintSystem()
    va, vb = cs.alloc_lc(), cs.alloc_lc()
    set_inputs(cs, [va, vb], [7, 9])
    less, le = comparison(cs, 8, va, vb)
    w = cs.generate_witness()
    # tamper: claim "not less"
    w[next(iter(less.terms))] ^= 1
    assert not cs.is_satisfied(w)


def msb_bits_of_bytes(data: bytes):
    out = []
    for byte in data:
        for i in range(7, -1, -1):
            out.append((byte >> i) & 1)
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_sha256_gadget_matches_hashlib(rng, seed):
    pre = bytes(rng.randrange(256) for _ in range(48))
    cs = ConstraintSystem()
    pre_bits = B.alloc_input_bits(cs, 384)
    set_inputs(cs, pre_bits, msb_bits_of_bytes(pre))
    block = sha256_48byte_block_bits(pre_bits)
    digest_bits = sha256_compression(cs, block)
    w = cs.generate_witness()
    assert cs.is_satisfied(w), cs.first_unsatisfied(w)
    got = bytes(
        sum(digest_bits[8 * i + j].eval(w) << (7 - j) for j in range(8))
        for i in range(32)
    )
    assert got == hashlib.sha256(pre).digest()


def test_sha256_gadget_rejects_wrong_digest(rng):
    pre = bytes(rng.randrange(256) for _ in range(48))
    cs = ConstraintSystem()
    pre_bits = B.alloc_input_bits(cs, 384)
    set_inputs(cs, pre_bits, msb_bits_of_bytes(pre))
    block = sha256_48byte_block_bits(pre_bits)
    digest_bits = sha256_compression(cs, block)
    # public digest pinned by equality constraints to a WRONG value
    wrong = bytearray(hashlib.sha256(pre).digest())
    wrong[0] ^= 1
    for i, bit in enumerate(msb_bits_of_bytes(bytes(wrong))):
        cs.enforce_equal(digest_bits[i], LC.const(bit))
    w = cs.generate_witness()
    assert not cs.is_satisfied(w)
