"""Vectorized witness plan == sequential hook run, bit-exact.

The fast path (r1cs.system.WitnessPlan) level-schedules typed hook
batches into numpy passes; the sequential path is the reference
semantics (allocation-order hooks, like the reference's
zklaim_gadget::generate_r1cs_witness, zklaim_gadget.cpp:705-783).
"""

import numpy as np

from zklaim_tpu.claims.circuit import (
    OP_EQ,
    OP_GREATER_EQ,
    OP_LESS,
    OP_NOOP,
    ZKlaimCircuit,
)
from zklaim_tpu.ff.limbs import ints_to_limbs
from zklaim_tpu.r1cs.system import WitnessVec


def _inputs(n):
    pre = bytes(range(48))
    ops = [OP_GREATER_EQ, OP_LESS, OP_EQ, OP_NOOP, OP_NOOP]
    # attribute u64s of pre: little-endian slots at offsets 0,8,16,24,32
    vals = [int.from_bytes(pre[8 * k : 8 * k + 8], "little") for k in range(5)]
    refs = [vals[0], vals[1] + 1, vals[2], 0, 0]
    return [(pre, refs, ops)] * n


def test_fast_witness_matches_sequential():
    c = ZKlaimCircuit(1)
    inputs = _inputs(1)
    fast = c.witness(inputs)
    assert isinstance(fast, WitnessVec)

    def init(w):
        from zklaim_tpu.claims.circuit import (
            bytes_to_bits_msb, ops_buffer, refs_buffer,
        )

        for (pre, refs, ops), (pv, rv, ov) in zip(
            inputs, c._payload_bit_vars
        ):
            for i, bit in enumerate(bytes_to_bits_msb(pre)):
                w[pv + i] = bit
            for i, bit in enumerate(bytes_to_bits_msb(refs_buffer(refs))):
                w[rv + i] = bit
            for i, bit in enumerate(bytes_to_bits_msb(ops_buffer(ops))):
                w[ov + i] = bit

    slow = c.cs.generate_witness(init, fast=False)
    assert isinstance(slow, list)
    assert len(slow) == len(fast)
    assert all(a == b for a, b in zip(slow, fast))
    assert c.cs.is_satisfied(fast)


def test_witnessvec_limbs_match_ints_to_limbs():
    c = ZKlaimCircuit(1)
    w = c.witness(_inputs(1))
    np.testing.assert_array_equal(
        w.to_plain_limbs(), ints_to_limbs(list(w))
    )


def test_witnessvec_big_values_roundtrip():
    w = WitnessVec(4)
    w[0] = 1
    w[1] = (1 << 200) + 12345
    w[2] = 7
    assert w[1] == (1 << 200) + 12345
    assert list(w) == [1, (1 << 200) + 12345, 7, 0]
    limbs = w.to_plain_limbs()
    np.testing.assert_array_equal(
        limbs, ints_to_limbs([1, (1 << 200) + 12345, 7, 0])
    )
