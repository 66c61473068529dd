"""Batched Montgomery field arithmetic over BN254 Fq / Fr for TPU.

All functions are pure, jit-able, and vectorized over arbitrary leading
batch axes; the trailing axis is the 16-limb base-2^16 representation
(see limbs.py).  Elements are kept in the Montgomery domain (x*R mod p,
R = 2^256) on device; conversion happens only at host boundaries.

Algorithm: CIOS (coarsely integrated operand scanning) Montgomery
multiplication with lazy carries.

Lazy-carry bound: during the i-th outer step, a limb receives at most
  plo + phi + qlo + qhi  <  4 * 2^16
and there are 16 outer steps plus one carry fold (< 2^7), so every
accumulator stays below 2^22 + 2^7 << 2^32.  No intermediate carry
propagation is required -- this is the property the 16-bit limb width
buys on the 32-bit TPU VPU.

TPU-native replacement for libff's Fp_model Montgomery arithmetic
(reference reaches it via libsnark; see SURVEY.md §2.6 row 1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import jax.numpy as jnp
from jax import lax

from . import params
from .limbs import (
    LIMB_BITS,
    LIMB_MASK,
    NUM_LIMBS,
    U32,
    carry_canonical,
    int_to_limbs,
    select,
    stack,
    sub_borrow,
    unstack,
)


@dataclass(frozen=True)
class FieldSpec:
    """Static per-field constants (hashable, safe as a jit static arg)."""

    name: str
    p: int
    pinv16: int          # -p^{-1} mod 2^16
    r_mod: int           # R mod p       (Montgomery one)
    r2: int              # R^2 mod p     (to-Montgomery factor)

    # numpy constants, derived in __post_init__
    p_limbs: np.ndarray = field(init=False, repr=False, compare=False)
    one_mont: np.ndarray = field(init=False, repr=False, compare=False)
    r2_limbs: np.ndarray = field(init=False, repr=False, compare=False)
    exp_p_minus_2_bits: np.ndarray = field(init=False, repr=False, compare=False)

    def __post_init__(self):
        object.__setattr__(self, "p_limbs", int_to_limbs(self.p))
        object.__setattr__(self, "one_mont", int_to_limbs(self.r_mod))
        object.__setattr__(self, "r2_limbs", int_to_limbs(self.r2))
        bits = np.array([(self.p - 2 >> i) & 1 for i in range(256)], dtype=np.uint32)
        object.__setattr__(self, "exp_p_minus_2_bits", bits)

    def __hash__(self):
        return hash((self.name, self.p))


FQ = FieldSpec("Fq", params.Q, params.Q_PINV16, params.Q_R_MOD, params.Q_R2)
FR = FieldSpec("Fr", params.R, params.R_PINV16, params.R_R_MOD, params.R_R2)


# ---------------------------------------------------------------------------
# Core kernels
# ---------------------------------------------------------------------------


def _cond_sub_p(spec: FieldSpec, limbs_list):
    """Given canonical limbs possibly in [0, 2p), reduce to [0, p)."""
    p_list = [jnp.asarray(np.uint32(v)) for v in spec.p_limbs]
    diff, borrow = sub_borrow(limbs_list, [jnp.broadcast_to(pv, limbs_list[0].shape) for pv in p_list])
    out = [jnp.where(borrow == 0, d, a) for d, a in zip(diff, limbs_list)]
    return out


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product abR^{-1} mod p. a, b: (..., 16) u32 canonical."""
    al = unstack(a)
    bl = unstack(b)
    L = NUM_LIMBS
    pinv = np.uint32(spec.pinv16)
    pl = [np.uint32(v) for v in spec.p_limbs]

    zero = jnp.zeros(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]), dtype=U32)
    t = [zero] * (2 * L + 1)

    for i in range(L):
        if i > 0:
            # positions < i are finalized (== 0 mod 2^16); fold their carry up
            t[i] = t[i] + (t[i - 1] >> LIMB_BITS)
        ai = al[i]
        # t += a_i * b * 2^(16 i)
        for j in range(L):
            prod = ai * bl[j]
            t[i + j] = t[i + j] + (prod & LIMB_MASK)
            t[i + j + 1] = t[i + j + 1] + (prod >> LIMB_BITS)
        # m = t[i] * (-p^-1) mod 2^16 ;  t += m * p * 2^(16 i)
        m = (t[i] * pinv) & LIMB_MASK
        for j in range(L):
            prod = m * pl[j]
            t[i + j] = t[i + j] + (prod & LIMB_MASK)
            t[i + j + 1] = t[i + j + 1] + (prod >> LIMB_BITS)

    t[L] = t[L] + (t[L - 1] >> LIMB_BITS)
    hi = t[L : 2 * L + 1]
    canon, carry = carry_canonical(hi)
    # result < 2p and fits 17 limbs; top limb after reduction must be absorbed
    # carry/canon[16] participate in the conditional subtract via a 17-limb cmp
    res16 = canon[:L]
    top = canon[L]
    # value = res16 + top*2^256 ; since value < 2p < 2^255, top == 0 always.
    del top, carry
    out = _cond_sub_p(spec, res16)
    return stack(out)


def add_mod(spec: FieldSpec, a, b):
    """(a + b) mod p, canonical in/out."""
    s = a.astype(U32) + b.astype(U32)
    canon, carry = carry_canonical(unstack(s))
    # a + b < 2p < 2^255 so carry out of 16 limbs is impossible
    return stack(_cond_sub_p(spec, canon))


def sub_mod(spec: FieldSpec, a, b):
    """(a - b) mod p, canonical in/out."""
    d, borrow = sub_borrow(unstack(a), unstack(b))
    p_plus = [di + pv for di, pv in zip(d, [np.uint32(v) for v in spec.p_limbs])]
    canon, _ = carry_canonical(p_plus)
    return select(borrow == 0, stack(d), stack(canon))


def neg_mod(spec: FieldSpec, a):
    zero = jnp.zeros_like(a)
    return sub_mod(spec, zero, a)


def double_mod(spec: FieldSpec, a):
    return add_mod(spec, a, a)


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def is_zero(a):
    """(..., 16) -> (...,) bool."""
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def mont_pow_bits(spec: FieldSpec, a, exp_bits: np.ndarray):
    """a^e for a fixed public exponent given as static LSB-first bit array.

    Square-and-multiply with lax.fori_loop (graph stays small); exponent is
    baked in as a constant uint32 vector.
    """
    bits = jnp.asarray(exp_bits, dtype=U32)
    one = jnp.broadcast_to(jnp.asarray(spec.one_mont), a.shape).astype(U32)

    def body(i, carry):
        acc, base = carry
        bit = bits[i]
        mul = mont_mul(spec, acc, base)
        acc = select(bit == 1, mul, acc)
        base = mont_sqr(spec, base)
        return acc, base

    acc, _ = lax.fori_loop(0, int(len(exp_bits)), body, (one, a))
    return acc


def mont_inv(spec: FieldSpec, a):
    """Batched inversion via Fermat: a^(p-2).  mont-domain in/out.

    0 maps to 0 (convenient for curve-point edge cases).
    """
    return mont_pow_bits(spec, a, spec.exp_p_minus_2_bits)


# ---------------------------------------------------------------------------
# Host boundary conversions
# ---------------------------------------------------------------------------


def to_mont(spec: FieldSpec, x):
    """Canonical limbs (plain domain) -> Montgomery domain."""
    r2 = jnp.broadcast_to(jnp.asarray(spec.r2_limbs), x.shape).astype(U32)
    return mont_mul(spec, x, r2)


def from_mont(spec: FieldSpec, x):
    """Montgomery domain -> plain domain limbs."""
    one = jnp.zeros_like(x).at[..., 0].set(1)
    return mont_mul(spec, x, one)


def encode_ints(spec: FieldSpec, xs) -> np.ndarray:
    """Host ints -> Montgomery-domain limb array (len(xs), 16), via numpy."""
    out = np.empty((len(xs), NUM_LIMBS), dtype=np.uint32)
    for j, x in enumerate(xs):
        v = (x % spec.p) * spec.r_mod % spec.p
        for i in range(NUM_LIMBS):
            out[j, i] = v & LIMB_MASK
            v >>= LIMB_BITS
    return out


def decode_ints(spec: FieldSpec, limbs) -> list:
    """Montgomery-domain limb array (..., 16) -> list of ints."""
    arr = np.asarray(limbs, dtype=np.uint64).reshape(-1, NUM_LIMBS)
    rinv = pow(params.MONT_R, -1, spec.p)
    out = []
    for row in arr:
        v = 0
        for i in range(NUM_LIMBS - 1, -1, -1):
            v = (v << LIMB_BITS) | int(row[i])
        out.append(v * rinv % spec.p)
    return out
