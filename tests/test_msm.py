"""Pippenger MSM and batched scalar-mul vs the host golden model."""

import pytest

# Device-kernel module: jit compiles of wide-limb graphs dominate
# cold runs; excluded from the fast CI suite (make test-fast).
pytestmark = pytest.mark.slow

import numpy as np
import pytest

import jax


@pytest.fixture(autouse=True)
def _eager_cpu():
    """Run this module eagerly on CPU: the fully unrolled flat-MSM graph
    (hundreds of inlined wide-limb point-adds) takes XLA:CPU tens of
    minutes to compile and aborts the compiler outright on the G2
    variant.  Eager execution checks identical numerics in seconds; the
    jitted program is exercised on real TPUs (bench.py, tools/msm_probe)
    and by the smaller graphs in test_groth16/test_parallel."""
    if jax.default_backend() == "cpu":
        with jax.disable_jit():
            yield
    else:
        yield

from zklaim_tpu.ec import jaxcurve as JC
from zklaim_tpu.ec.hostcurve import g1_generator, g1_infinity, g2_generator
from zklaim_tpu.ff.limbs import ints_to_limbs
from zklaim_tpu.ff.params import R
from zklaim_tpu.msm import pippenger as P

import jax.numpy as jnp


def host_msm(points, scalars):
    acc = None
    for p, s in zip(points, scalars):
        t = p * s
        acc = t if acc is None else acc + t
    return acc


def test_signed_digits_reconstruct(rng):
    c = 8
    scalars = [rng.randrange(R) for _ in range(16)] + [0, 1, R - 1]
    limbs = jnp.asarray(ints_to_limbs(scalars))
    digits = np.asarray(P.signed_digits(limbs, c))
    for i, s in enumerate(scalars):
        v = sum(int(digits[w, i]) << (c * w) for w in range(digits.shape[0]))
        assert v == s
        assert np.max(np.abs(digits[:, i])) <= 1 << (c - 1)


@pytest.mark.parametrize("c", [4, 8])
def test_msm_g1(rng, c):
    n = 32
    gen = g1_generator()
    points = [gen * rng.randrange(1, R) for _ in range(n)]
    # include edge scalars: 0, 1, r-1 and a duplicate point
    scalars = [rng.randrange(R) for _ in range(n - 3)] + [0, 1, R - 1]
    points[5] = points[4]

    want = host_msm(points, scalars)
    jac = JC.host_points_to_jac(JC.FQ_OPS, points)
    limbs = jnp.asarray(ints_to_limbs(scalars))
    out = jax.jit(P.msm, static_argnums=(0, 3))(JC.FQ_OPS, jac, limbs, c)
    got = JC.jac_to_host_points(JC.FQ_OPS, jax.tree.map(lambda a: a[None], out))[0]
    assert got == want


def test_msm_g2(rng):
    n = 8
    gen = g2_generator()
    points = [gen * rng.randrange(1, R) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    want = host_msm(points, scalars)
    jac = JC.host_points_to_jac(JC.FQ2_OPS, points)
    limbs = jnp.asarray(ints_to_limbs(scalars))
    out = jax.jit(P.msm, static_argnums=(0, 3))(JC.FQ2_OPS, jac, limbs, 4)
    got = JC.jac_to_host_points(JC.FQ2_OPS, jax.tree.map(lambda a: a[None], out))[0]
    assert got == want


def test_msm_all_zero_scalars():
    n = 4
    gen = g1_generator()
    points = [gen * (i + 1) for i in range(n)]
    jac = JC.host_points_to_jac(JC.FQ_OPS, points)
    limbs = jnp.asarray(ints_to_limbs([0] * n))
    out = jax.jit(P.msm, static_argnums=(0, 3))(JC.FQ_OPS, jac, limbs, 4)
    got = JC.jac_to_host_points(JC.FQ_OPS, jax.tree.map(lambda a: a[None], out))[0]
    assert got == g1_infinity()


def test_msm_chunked_path(rng, monkeypatch):
    """Large-input scan-over-chunks path matches the direct kernel."""
    monkeypatch.setitem(P.MAX_CHUNK, 1, 16)
    n = 40  # pads to 48 = 3 chunks of 16
    gen = g1_generator()
    points = [gen * rng.randrange(1, R) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    want = host_msm(points, scalars)
    jac = JC.host_points_to_jac(JC.FQ_OPS, points)
    limbs = jnp.asarray(ints_to_limbs(scalars))
    out = P.msm_pow2(JC.FQ_OPS, jac, limbs, 4)
    got = JC.jac_to_host_points(JC.FQ_OPS, jax.tree.map(lambda a: a[None], out))[0]
    assert got == want


def test_scalar_mul_batched(rng):
    gen = g1_generator()
    points = [gen * k for k in (1, 2, 3, 4)]
    scalars = [rng.randrange(R) for _ in range(3)] + [0]
    want = [p * s for p, s in zip(points, scalars)]
    jac = JC.host_points_to_jac(JC.FQ_OPS, points)
    limbs = jnp.asarray(ints_to_limbs(scalars))
    out = jax.jit(JC.scalar_mul, static_argnums=0)(JC.FQ_OPS, jac, limbs)
    assert JC.jac_to_host_points(JC.FQ_OPS, out) == want


def test_msm_pallas_path_matches(rng, monkeypatch):
    """The fused Pallas scan path (interpret mode on CPU) == XLA path."""
    monkeypatch.setenv("ZKLAIM_MSM_PALLAS", "1")
    n = 16
    gen = g1_generator()
    points = [gen * rng.randrange(1, R) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n - 2)] + [0, 1]
    want = host_msm(points, scalars)
    jac = JC.host_points_to_jac(JC.FQ_OPS, points)
    limbs = jnp.asarray(ints_to_limbs(scalars))
    out = jax.jit(P.msm, static_argnums=(0, 3))(JC.FQ_OPS, jac, limbs, 8)
    got = JC.jac_to_host_points(JC.FQ_OPS, jax.tree.map(lambda a: a[None], out))[0]
    assert got == want
