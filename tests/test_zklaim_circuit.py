"""The zklaim predicate circuit: satisfiability + input-map consistency."""

import hashlib

import pytest

from zklaim_tpu.claims import circuit as ZC
from zklaim_tpu.claims.circuit import (
    OP_EQ,
    OP_GREATER,
    OP_GREATER_EQ,
    OP_LESS,
    OP_LESS_EQ,
    OP_NOOP,
    OP_NOT_EQ,
    ZKlaimCircuit,
    public_inputs_for,
)


def make_pre(attrs, salt=0xDEADBEEF00C0FFEE):
    """48-byte preimage: 5 LE u64 attributes + LE u64 salt."""
    vals = list(attrs) + [salt]
    return b"".join(int(v).to_bytes(8, "little") for v in vals)


GOOD_PAYLOAD = (
    make_pre([25, 40000, 7, 7, 1]),
    [18, 50000, 7, 9, 99],
    [OP_GREATER_EQ, OP_LESS, OP_EQ, OP_NOT_EQ, OP_NOOP],
)


@pytest.fixture(scope="module")
def circuit1():
    return ZKlaimCircuit(1)


def test_satisfied_with_valid_predicates(circuit1):
    c = circuit1
    w = c.witness([GOOD_PAYLOAD])
    assert c.cs.is_satisfied(w), c.cs.first_unsatisfied(w)


def test_packed_primary_matches_input_map(circuit1):
    c = circuit1
    w = c.witness([GOOD_PAYLOAD])
    packed_in_witness = [w[v] for v in c.packed_vars]
    assert packed_in_witness == c.public_inputs([GOOD_PAYLOAD])
    # and the verifier-side map from the raw hash agrees
    pre, refs, ops = GOOD_PAYLOAD
    assert c.public_inputs([GOOD_PAYLOAD]) == public_inputs_for(
        [(hashlib.sha256(pre).digest(), refs, ops)]
    )


@pytest.mark.parametrize("op,data,ref,ok", [
    (OP_LESS, 5, 6, True), (OP_LESS, 6, 6, False),
    (OP_LESS_EQ, 6, 6, True), (OP_LESS_EQ, 7, 6, False),
    (OP_EQ, 6, 6, True), (OP_EQ, 5, 6, False),
    (OP_GREATER_EQ, 6, 6, True), (OP_GREATER_EQ, 5, 6, False),
    (OP_GREATER, 7, 6, True), (OP_GREATER, 6, 6, False),
    (OP_NOT_EQ, 5, 6, True), (OP_NOT_EQ, 6, 6, False),
    (OP_NOOP, 0, 12345, True),
])
def test_each_operator(circuit1, op, data, ref, ok):
    c = circuit1
    payload = (
        make_pre([data, 0, 0, 0, 0]),
        [ref, 0, 0, 0, 0],
        [op, OP_NOOP, OP_NOOP, OP_NOOP, OP_NOOP],
    )
    w = c.witness([payload])
    assert c.cs.is_satisfied(w) == ok


def test_two_payloads():
    c = ZKlaimCircuit(2)
    other = (
        make_pre([100, 200, 300, 400, 500]),
        [100, 100, 400, 400, 0],
        [OP_EQ, OP_GREATER, OP_LESS, OP_LESS_EQ, OP_NOOP],
    )
    w = c.witness([GOOD_PAYLOAD, other])
    assert c.cs.is_satisfied(w), c.cs.first_unsatisfied(w)
    assert [w[v] for v in c.packed_vars] == c.public_inputs([GOOD_PAYLOAD, other])


def test_wrong_preimage_breaks_hash(circuit1):
    """Witness built from one preimage, public input claims another hash."""
    c = circuit1
    w = c.witness([GOOD_PAYLOAD])
    bad_payload = (make_pre([26, 40000, 7, 7, 1]),) + GOOD_PAYLOAD[1:]
    bad_public = c.public_inputs([bad_payload])
    for v, val in zip(c.packed_vars, bad_public):
        w[v] = val
    assert not c.cs.is_satisfied(w)
