"""Checkpoint/resume (claims.store) and phase profiling (utils.profiling)."""

import random

import pytest

from zklaim_tpu.claims import serde, signing, store
from zklaim_tpu.claims.api import Context, Payload, ZKLAIM_OK, ZkOp
from zklaim_tpu.utils.profiling import PhaseTimer


@pytest.fixture(scope="module")
def tiny_ctx():
    """Zero-payload context: full real setup, cheapest possible circuit."""
    rng = random.Random(7)
    ctx = Context()
    assert ctx.trusted_setup(rng) == ZKLAIM_OK
    assert ctx.sign(signing.keygen(rng), rng) == ZKLAIM_OK
    return ctx


def test_issuer_state_roundtrip(tmp_path, tiny_ctx):
    store.save_issuer_state(str(tmp_path), tiny_ctx)
    back = store.load_issuer_state(str(tmp_path))
    assert back.pk == tiny_ctx.pk
    assert back.vk == tiny_ctx.vk
    assert back.pub_key == tiny_ctx.pub_key
    assert back.signature == tiny_ctx.signature
    assert back.verify_signature()


def test_key_magic_validation(tmp_path, tiny_ctx):
    p = tmp_path / "pk.zkl"
    p.write_bytes(b"NOPE" + bytes(64))
    with pytest.raises(serde.SerdeError):
        store.load_proving_key(str(p))
    store.save_proving_key(str(p), tiny_ctx.pk)
    assert store.load_proving_key(str(p)) == tiny_ctx.pk


def test_context_corruption_raises(tmp_path, tiny_ctx):
    p = tmp_path / "ctx.zkl"
    raw = bytearray(tiny_ctx.serialize())
    raw[50] ^= 0xFF                       # break the header digest
    p.write_bytes(bytes(raw))
    with pytest.raises(ValueError):
        store.load_context(str(p))


def test_atomic_write_no_partial_file(tmp_path):
    target = tmp_path / "sub" / "x.bin"
    store._atomic_write(str(target), b"abc")
    assert target.read_bytes() == b"abc"
    leftovers = [f for f in (tmp_path / "sub").iterdir() if f.name != "x.bin"]
    assert leftovers == []


def test_phase_timer_csv_schema():
    t = PhaseTimer()
    with t.phase("issuer"):
        pass
    with t.phase("prover"):
        pass
    with t.phase("verifier"):
        pass
    row = t.csv_row(3, (100, 20, 5))
    fields = row.split(",")
    assert len(fields) == 8
    assert fields[1] == "3" and fields[5:] == ["100", "20", "5"]
    assert t.counts == {"issuer": 1, "prover": 1, "verifier": 1}
