"""ECDSA-over-Ed25519 signing vs the reference's gcrypt fixtures."""

import random

import pytest

from zklaim_tpu.claims import signing as S

import os

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def fixtures():
    priv = open(f"{FIX}/ed25519_priv", "rb").read()
    pub = open(f"{FIX}/ed25519_pub", "rb").read()
    sig = open(f"{FIX}/randfile_sig", "rb").read()
    # crypttest.c signs only the first 1024 bytes of randfile
    msg = open(f"{FIX}/randfile", "rb").read()[:1024]
    return priv, pub, sig, msg


def test_fixture_pub_derivation(fixtures):
    priv, pub, _, _ = fixtures
    assert S.pk_to_pub(priv) == pub
    # d * G recompresses to the fixture public key
    d = int.from_bytes(priv[32:], "big")
    assert S.point_compress(S._mul(d, S.G)) == pub


def test_fixture_signature_verifies(fixtures):
    priv, pub, sig, msg = fixtures
    assert S.verify(msg, sig, pub)


def test_fixture_signature_negative(fixtures):
    _, pub, sig, msg = fixtures
    assert not S.verify(msg + b"x", sig, pub)
    bad = bytearray(sig)
    bad[0] ^= 1
    assert not S.verify(msg, bytes(bad), pub)
    assert not S.verify(msg, sig, bytes(32))


def test_sign_verify_roundtrip(fixtures):
    priv, pub, _, msg = fixtures
    rng = random.Random(7)
    sig = S.sign(msg, priv, rng)
    assert len(sig) == 64
    assert S.verify(msg, sig, pub)
    assert not S.verify(b"other", sig, pub)


def test_keygen_roundtrip():
    rng = random.Random(8)
    priv = S.keygen(rng)
    assert len(priv) == 64
    pub = S.pk_to_pub(priv)
    sig = S.sign(b"hello zklaim", priv, rng)
    assert S.verify(b"hello zklaim", sig, pub)
    priv2 = S.keygen(rng)
    assert not S.verify(b"hello zklaim", sig, S.pk_to_pub(priv2))
