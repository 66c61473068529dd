"""Comb fixed-base multiplication vs host scalar-mul."""

import pytest

# Device-kernel module: jit compiles of wide-limb graphs dominate
# cold runs; excluded from the fast CI suite (make test-fast).
pytestmark = pytest.mark.slow

import jax.numpy as jnp
import pytest

from zklaim_tpu.ec import jaxcurve as JC
from zklaim_tpu.ec.hostcurve import g1_generator, g1_infinity, g2_generator
from zklaim_tpu.ff.limbs import ints_to_limbs
from zklaim_tpu.ff.params import R
from zklaim_tpu.msm.fixedbase import fixed_base_mul


def test_fixed_base_g1(rng):
    scalars = [0, 1, 2, R - 1] + [rng.randrange(R) for _ in range(4)]
    limbs = jnp.asarray(ints_to_limbs(scalars))
    out = fixed_base_mul(JC.FQ_OPS, "g1", limbs)
    got = JC.proj_to_host_points(JC.FQ_OPS, out)
    gen = g1_generator()
    want = [gen * s if s else g1_infinity() for s in scalars]
    assert got == want


def test_fixed_base_g2(rng):
    scalars = [1, rng.randrange(R)]
    limbs = jnp.asarray(ints_to_limbs(scalars))
    out = fixed_base_mul(JC.FQ2_OPS, "g2", limbs)
    got = JC.proj_to_host_points(JC.FQ2_OPS, out)
    gen = g2_generator()
    assert got == [gen * s for s in scalars]
