"""Fused Pallas point ops == XLA point ops, bit-exact (interpret on CPU)."""

import pytest

# Device-kernel module: jit compiles of wide-limb graphs dominate
# cold runs; excluded from the fast CI suite (make test-fast).
pytestmark = pytest.mark.slow

import random

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from zklaim_tpu.ec import jaxcurve as JC
from zklaim_tpu.ec import pallas_curve as PC
from zklaim_tpu.ec.hostcurve import g1_generator, g2_generator
from zklaim_tpu.ff.params import R


def _rand_points(rng, gen, n):
    return [gen * rng.randrange(1, R) for _ in range(n)]


@pytest.mark.parametrize("group", ["g1", "g2"])
def test_pallas_add_matches_xla(rng, group):
    f = JC.FQ_OPS if group == "g1" else JC.FQ2_OPS
    gen = g1_generator() if group == "g1" else g2_generator()
    n = 8
    p_host = _rand_points(rng, gen, n)
    q_host = _rand_points(rng, gen, n)
    # edge cases: P + inf, inf + Q, P + P, P + (-P)
    p_host[0] = gen * 0
    q_host[1] = gen * 0
    q_host[2] = p_host[2]
    q_host[3] = -p_host[3]
    p = JC.host_points_to_proj(f, p_host)
    q = JC.host_points_to_proj(f, q_host)

    expect = jax.jit(JC.point_add, static_argnums=0)(f, p, q)
    got = PC.point_add(f, p, q)
    for e, g in zip(expect, got):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(g))


@pytest.mark.parametrize("group", ["g1", "g2"])
def test_pallas_double_matches_xla(rng, group):
    f = JC.FQ_OPS if group == "g1" else JC.FQ2_OPS
    gen = g1_generator() if group == "g1" else g2_generator()
    p_host = _rand_points(rng, gen, 6)
    p_host[0] = gen * 0                      # double(inf)
    p = JC.host_points_to_proj(f, p_host)

    expect = jax.jit(JC.point_double, static_argnums=0)(f, p)
    got = PC.point_double(f, p)
    for e, g in zip(expect, got):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(g))


@pytest.mark.tpu
@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="regression for a Mosaic crash"
)
@pytest.mark.parametrize("group", ["g1", "g2"])
def test_pallas_add_wide_batch_on_tpu(rng, group):
    """Regression: the G2 kernel at MSM-chunk widths crashed Mosaic's
    vector layout pass ((2,16,N) blocks + (16,1) const broadcasts) --
    the default prove path was dead on hardware until round 4."""
    f = JC.FQ_OPS if group == "g1" else JC.FQ2_OPS
    gen = g1_generator() if group == "g1" else g2_generator()
    base = JC.host_points_to_proj(f, _rand_points(rng, gen, 8))
    n = 2048
    p = jax.tree.map(
        lambda a: jnp.tile(a, (n // 8,) + (1,) * (a.ndim - 1)), base
    )
    expect = jax.jit(JC.point_add, static_argnums=0)(f, p, p)
    got = PC.point_add(f, p, p)
    for e, g in zip(expect, got):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(g))


def test_pallas_add_nonaligned_batch(rng):
    """Batch sizes that need lane padding (not multiples of 128)."""
    f = JC.FQ_OPS
    gen = g1_generator()
    for n in (1, 3, 130):
        p = JC.host_points_to_proj(f, _rand_points(rng, gen, n))
        q = JC.host_points_to_proj(f, _rand_points(rng, gen, n))
        expect = jax.jit(JC.point_add, static_argnums=0)(f, p, q)
        got = PC.point_add(f, p, q)
        for e, g in zip(expect, got):
            np.testing.assert_array_equal(np.asarray(e), np.asarray(g))
