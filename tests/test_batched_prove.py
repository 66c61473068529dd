"""Data-parallel batched proving: sharded batch == sequential prove."""

import pytest

# Device-kernel module: jit compiles of wide-limb graphs dominate
# cold runs; excluded from the fast CI suite (make test-fast).
pytestmark = pytest.mark.slow

import random

import pytest

from zklaim_tpu.ff.params import R
from zklaim_tpu.groth16.api import setup, verify
from zklaim_tpu.parallel.mesh import make_mesh
from zklaim_tpu.parallel.prove import batched_prove

from test_groth16 import factor_circuit


def _witness(cs, x, y, xv, yv):
    xi, yi = next(iter(x.terms)), next(iter(y.terms))

    def hook(w):
        w[xi], w[yi] = xv, yv
        w[1] = xv * yv % R          # z is the first allocated var

    cs.hooks.insert(0, hook)
    w = cs.generate_witness()
    cs.hooks.pop(0)
    return w


@pytest.fixture(scope="module")
def keys():
    cs, z, x, y = factor_circuit()
    pk, vk, qap = setup(cs, random.Random(52))
    return cs, x, y, pk, vk, qap


def test_batched_prove_verifies(keys):
    cs, x, y, pk, vk, qap = keys
    pairs = [(3, 5), (6, 7), (2, 9), (10, 11), (4, 13)]  # 5 proofs, 8 devices
    witnesses = [_witness(cs, x, y, xv, yv) for xv, yv in pairs]
    mesh = make_mesh()
    proofs = batched_prove(mesh, pk, qap, witnesses, random.Random(53))
    assert len(proofs) == len(pairs)
    for (xv, yv), proof in zip(pairs, proofs):
        assert verify(vk, [xv * yv % R], proof)
    # proofs are bound to their own statement
    assert not verify(vk, [pairs[0][0] * pairs[0][1]], proofs[1])


def test_batched_prove_rejects_bad_witness(keys):
    cs, x, y, pk, vk, qap = keys
    w = _witness(cs, x, y, 6, 7)
    bad = list(w)
    bad[1] = (bad[1] + 1) % R
    mesh = make_mesh()
    with pytest.raises(ValueError):
        batched_prove(mesh, pk, qap, [w, bad], random.Random(54))


def test_batched_prove_empty(keys):
    cs, x, y, pk, vk, qap = keys
    assert batched_prove(make_mesh(), pk, qap, [], random.Random(55)) == []
