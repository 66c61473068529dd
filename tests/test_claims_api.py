"""Credential layer: payload wire layout, context serialize, sign/verify."""

import hashlib
import random

import pytest

from zklaim_tpu.claims import signing
from zklaim_tpu.claims.api import (
    HEADER_WIRE_SIZE,
    PAYLOAD_WIRE_SIZE,
    ZKLAIM_ERROR,
    ZKLAIM_INVALID_PROOF,
    ZKLAIM_INVALID_SIGNATURE,
    ZKLAIM_OK,
    Context,
    Payload,
    ZkOp,
)


def issuer_payload(rng=None):
    pl = Payload()
    pl.set_attr(25, 0)           # age
    pl.set_attr(40000, 1)        # salary
    pl.data_ref = [18, 50000, 0, 0, 0]
    pl.data_op = [ZkOp.GREATER_OR_EQ, ZkOp.LESS, ZkOp.NOOP, ZkOp.NOOP, ZkOp.NOOP]
    pl.hash_payload(rng)
    return pl


def test_set_attr_and_hash(rng):
    pl = issuer_payload(rng)
    assert pl.pre[:8] == (25).to_bytes(8, "little")
    assert pl.pre[8:16] == (40000).to_bytes(8, "little")
    assert pl.pre[40:48] == pl.salt.to_bytes(8, "little")
    assert pl.hash == hashlib.sha256(pl.pre).digest()
    # reference quirk: pos == 5 overwrites the salt slot; pos == 6 errors
    assert pl.set_attr(1, 5) == ZKLAIM_OK
    assert pl.set_attr(1, 6) == ZKLAIM_ERROR


def test_payload_wire_roundtrip(rng):
    pl = issuer_payload(rng)
    raw = pl.to_bytes()
    assert len(raw) == PAYLOAD_WIRE_SIZE
    # C layout offsets (verified against gcc: salt@64, hash@72, priv@104, pre@105)
    assert raw[64:72] == pl.salt.to_bytes(8, "little")
    assert raw[72:104] == pl.hash
    assert raw[40:44] == int(ZkOp.GREATER_OR_EQ).to_bytes(4, "little")
    assert raw[60:64] == bytes(4)  # alignment padding
    back = Payload.from_bytes(raw)
    assert back.to_bytes() == raw
    assert back.data_ref == pl.data_ref and back.pre == pl.pre


def test_blinding(rng):
    pl = issuer_payload(rng)
    pl.clear_pre()
    assert pl.pre == bytes(48) and pl.salt == 0 and pl.priv == 1
    assert pl.hash != bytes(32)  # hash stays


def test_context_serialize_roundtrip(rng):
    ctx = Context()
    ctx.add_payload(issuer_payload(rng))
    ctx.add_payload(issuer_payload(rng))
    ctx.vk = b"FAKE-VK-BYTES"
    ctx.proof = b"FAKE-PROOF"
    priv = signing.keygen(rng)
    assert ctx.sign(priv, rng) == ZKLAIM_OK

    raw = ctx.serialize()
    assert len(raw) == HEADER_WIRE_SIZE + 2 * PAYLOAD_WIRE_SIZE + len(ctx.vk) + 64 + len(ctx.proof)
    back, status = Context.deserialize(raw)
    assert status == ZKLAIM_OK
    assert back.num_payloads == 2
    assert back.vk == ctx.vk and back.proof == ctx.proof
    assert back.pub_key == ctx.pub_key and back.signature == ctx.signature
    assert back.payloads[0].to_bytes() == ctx.payloads[0].to_bytes()
    assert back.verify_signature()


def test_deserialize_rejects_corruption(rng):
    ctx = Context()
    ctx.add_payload(issuer_payload(rng))
    priv = signing.keygen(rng)
    ctx.sign(priv, rng)
    raw = bytearray(ctx.serialize())

    _, status = Context.deserialize(bytes(raw[:-1]))      # truncated
    assert status == ZKLAIM_ERROR
    bad = bytearray(raw)
    bad[0] ^= 1                                           # header digest broken
    _, status = Context.deserialize(bytes(bad))
    assert status == ZKLAIM_ERROR


def test_signature_detects_tampered_refs(rng):
    """The reference's can_detect_invalid_signature scenario
    (tests/zklaim.cpp:87-175): prover edits refs + rehashes -> sig fails."""
    ctx = Context()
    ctx.add_payload(issuer_payload(rng))
    ctx.vk = b"vk"
    priv = signing.keygen(rng)
    ctx.sign(priv, rng)
    assert ctx.verify_signature()

    ctx.payloads[0].data_ref[0] = 10   # claim "age >= 10" instead
    ctx.payloads[0].hash_payload(rng)  # rehash changes the signed view
    assert not ctx.verify_signature()
    assert ctx.verify() == ZKLAIM_INVALID_SIGNATURE


def test_verify_reports_missing_proof(rng):
    """No proof present -> ZKLAIM_INVALID_PROOF (tests/zklaim.cpp:183-220)."""
    ctx = Context()
    ctx.add_payload(issuer_payload(rng))
    ctx.vk = b"vk"
    priv = signing.keygen(rng)
    ctx.sign(priv, rng)
    assert ctx.verify() == ZKLAIM_INVALID_PROOF
