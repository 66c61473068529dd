"""Multi-limb big-integer representation for TPU field kernels.

Layout: little-endian base-2**16 limbs held in uint32, trailing axis of
length NUM_LIMBS (16) => 256 bits per element.  The 16-bit limb width is
chosen for the TPU VPU: a 16x16-bit product fits exactly in a uint32
(max (2^16-1)^2 < 2^32), and lo/hi split accumulators stay below 2^32 for
the full schoolbook/CIOS inner loop without intermediate carry passes
(lazy-carry bound analysis in montgomery.py).

This file has the representation plumbing + raw (non-modular) helpers;
modular/Montgomery arithmetic lives in montgomery.py.

TPU-native replacement for GMP/libff bigint (SURVEY.md §2.6 row 1).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .params import LIMB_BITS, LIMB_MASK, NUM_LIMBS

U32 = jnp.uint32


# ---------------------------------------------------------------------------
# Host <-> limb conversion (numpy; exact for arbitrary ints)
# ---------------------------------------------------------------------------


def int_to_limbs(x: int, n: int = NUM_LIMBS) -> np.ndarray:
    """Single int -> (n,) uint32 limb array (little-endian base 2^16)."""
    out = np.empty(n, dtype=np.uint32)
    for i in range(n):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    if x:
        raise ValueError("integer does not fit in limb array")
    return out


def ints_to_limbs(xs, n: int = NUM_LIMBS) -> np.ndarray:
    """Iterable of ints -> (len, n) uint32 limb array."""
    xs = list(xs)
    out = np.empty((len(xs), n), dtype=np.uint32)
    for j, x in enumerate(xs):
        for i in range(n):
            out[j, i] = x & LIMB_MASK
            x >>= LIMB_BITS
        if x:
            raise ValueError("integer does not fit in limb array")
    return out


def limbs_to_int(a) -> int:
    """(n,) limb array -> int."""
    a = np.asarray(a, dtype=np.uint64)
    x = 0
    for i in range(a.shape[-1] - 1, -1, -1):
        x = (x << LIMB_BITS) | int(a[i])
    return x


def limbs_to_ints(a):
    """(..., n) limb array -> nested list of ints (flattened to 1-D list)."""
    a = np.asarray(a, dtype=np.uint64).reshape(-1, np.asarray(a).shape[-1])
    return [limbs_to_int(row) for row in a]


def u64s_to_limbs(xs: np.ndarray, n: int = NUM_LIMBS) -> np.ndarray:
    """Vectorized: (...,) uint64 array -> (..., n) uint32 limbs (zero-padded)."""
    xs = np.asarray(xs, dtype=np.uint64)
    out = np.zeros(xs.shape + (n,), dtype=np.uint32)
    for i in range(4):
        out[..., i] = (xs >> np.uint64(LIMB_BITS * i)) & np.uint64(LIMB_MASK)
    return out


# ---------------------------------------------------------------------------
# Raw limb helpers (jnp, batched over leading axes)
# ---------------------------------------------------------------------------


def unstack(a):
    """(..., n) -> list of n arrays (...,). Keeps mont-mul free of scatters."""
    return [a[..., i] for i in range(a.shape[-1])]


def stack(limbs):
    return jnp.stack(limbs, axis=-1)


def carry_canonical(limbs_list):
    """Propagate carries so every limb < 2^16. Input: list of u32 lazy limbs.

    Returns (canonical_list, final_carry).  Sequential in limb index (length
    L loop, unrolled at trace time); vectorized over the batch.
    """
    out = []
    carry = jnp.zeros_like(limbs_list[0])
    for limb in limbs_list:
        t = limb + carry
        out.append(t & LIMB_MASK)
        carry = t >> LIMB_BITS
    return out, carry


def sub_borrow(a_list, b_list):
    """a - b with borrow chain (canonical <2^16 limbs in, canonical out).

    Returns (limbs, borrow_flag in {0,1}).  With canonical inputs each step
    value is in [-(2^16), 2^16), so after u32 wraparound the sign lives in
    bit 31.
    """
    out = []
    borrow = jnp.zeros_like(a_list[0])
    for ai, bi in zip(a_list, b_list):
        d = ai - bi - borrow  # u32 wraparound is well-defined
        out.append(d & LIMB_MASK)
        borrow = d >> 31
    return out, borrow


def geq(a, b):
    """(..., n) >= (..., n) elementwise over the batch (canonical limbs)."""
    _, borrow = sub_borrow(unstack(a), unstack(b))
    return borrow == 0


def select(mask, a, b):
    """Broadcast select over trailing limb axis: mask (...,), a/b (..., n)."""
    return jnp.where(mask[..., None], a, b)
