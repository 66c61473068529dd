"""Radix-2 NTT vs host (python-int) naive DFT over Fr."""

import pytest

# Device-kernel module: jit compiles of wide-limb graphs dominate
# cold runs; excluded from the fast CI suite (make test-fast).
pytestmark = pytest.mark.slow

import numpy as np
import pytest

from zklaim_tpu.ff import montgomery as M
from zklaim_tpu.ff.montgomery import FR
from zklaim_tpu.ff.params import R
from zklaim_tpu.ntt.radix2 import get_domain


def naive_dft(coeffs, omega, p):
    n = len(coeffs)
    return [
        sum(c * pow(omega, i * j, p) for j, c in enumerate(coeffs)) % p
        for i in range(n)
    ]


def enc(xs):
    return M.encode_ints(FR, xs)


def dec(a):
    return M.decode_ints(FR, a)


@pytest.mark.parametrize("n", [8, 32])
def test_ntt_matches_naive_dft(rng, n):
    dom = get_domain(n)
    coeffs = [rng.randrange(R) for _ in range(n)]
    want = naive_dft(coeffs, dom.omega, R)
    got = dec(dom.ntt(enc(coeffs)))
    assert got == want


@pytest.mark.parametrize("n", [8, 32])
def test_intt_roundtrip(rng, n):
    dom = get_domain(n)
    coeffs = [rng.randrange(R) for _ in range(n)]
    back = dec(dom.intt(dom.ntt(enc(coeffs))))
    assert back == coeffs


def test_coset_ntt_evaluates_on_shifted_domain(rng):
    n = 16
    dom = get_domain(n)
    coeffs = [rng.randrange(R) for _ in range(n)]
    # coset evaluation i -> P(g * omega^i)
    want = [
        sum(c * pow(dom.shift * pow(dom.omega, i, R), j, R) for j, c in enumerate(coeffs)) % R
        for i in range(n)
    ]
    got = dec(dom.coset_ntt(enc(coeffs)))
    assert got == want


def test_coset_roundtrip_and_polymul(rng):
    n = 16
    dom = get_domain(n)
    coeffs = [rng.randrange(R) for _ in range(n)]
    assert dec(dom.coset_intt(dom.coset_ntt(enc(coeffs)))) == coeffs

    # polynomial product of two degree < n/2 polys via NTT pointwise mul
    a = [rng.randrange(R) for _ in range(n // 2)] + [0] * (n // 2)
    b = [rng.randrange(R) for _ in range(n // 2)] + [0] * (n // 2)
    ea, eb = dom.ntt(enc(a)), dom.ntt(enc(b))
    prod = dec(dom.intt(M.mont_mul(FR, ea, eb)))
    want = [0] * n
    for i, ai in enumerate(a[: n // 2]):
        for j, bj in enumerate(b[: n // 2]):
            if ai and bj:
                want[(i + j) % n] = (want[(i + j) % n] + ai * bj) % R
    assert prod == want
