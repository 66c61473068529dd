"""In-kernel Montgomery field arithmetic for Pallas TPU kernels.

Value-level helpers meant to be called INSIDE a pallas kernel body.
Layout is struct-of-arrays: an Fq element batch is a (16, N) uint32
array -- limbs on sublanes, batch lanes on the 128-wide lane axis (the
TPU-native layout; the XLA path in ff/montgomery.py is limbs-last).
All intermediates live in VMEM/vector registers, which is the point:
one fused curve-op kernel replaces dozens of HBM-roundtripping XLA ops
(reference hot loops: libff Fp_model mul inside libsnark multi_exp;
SURVEY.md §2.6 rows 1,3).

Same algorithm as ff/montgomery.py (full-width SOS/REDC, lazy u32
carries; see that module's docstring for the bound analysis), expressed
with row (sublane) shifts instead of the (…, 16, 16) outer product:
the 16 partial products of a 256x256-bit multiply accumulate into a
(32, N) lazy buffer via statically-padded adds.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from . import params
from .limbs import LIMB_BITS, LIMB_MASK, NUM_LIMBS

L = NUM_LIMBS
MASK = LIMB_MASK


def field_consts(spec) -> tuple[np.ndarray, np.ndarray]:
    """(p, -p^{-1} mod R) as (16, 1) u32 column constants for a kernel."""
    p_col = np.asarray(spec.p_limbs, dtype=np.uint32).reshape(L, 1)
    np_col = np.asarray(spec.nprime_limbs, dtype=np.uint32).reshape(L, 1)
    return p_col, np_col


def conv(a, b):
    """(16, N) x (16, N) canonical -> (32, N) lazy product limbs < 2^21."""
    acc = None
    for i in range(L):
        p = a[i][None, :] * b                                  # (16, N) exact
        lo = jnp.pad(p & MASK, ((i, L - i), (0, 0)))           # rows i..i+15
        hi = jnp.pad(p >> LIMB_BITS, ((i + 1, L - 1 - i), (0, 0)))
        term = lo + hi
        acc = term if acc is None else acc + term
    return acc


def conv_low(a, b):
    """Low 16 rows of conv(a, b): the product mod 2^256, lazy."""
    acc = None
    for i in range(L):
        p = a[i][None, :] * b
        lo = jnp.pad((p & MASK)[: L - i], ((i, 0), (0, 0)))
        term = lo
        if i + 1 < L:
            hi = jnp.pad((p >> LIMB_BITS)[: L - i - 1], ((i + 1, 0), (0, 0)))
            term = term + hi
        acc = term if acc is None else acc + term
    return acc


def carry16(x):
    """Canonicalize (16, N) lazy limbs; returns (canonical, carry_out (N,))."""
    outs = []
    carry = jnp.zeros_like(x[0])
    for i in range(L):
        v = x[i] + carry
        outs.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(outs, axis=0), carry


def sub_borrow(a, b):
    """(a - b) mod 2^256 on canonical limbs; returns (diff, borrow (N,))."""
    outs = []
    borrow = jnp.zeros_like(a[0])
    for i in range(L):
        t = a[i] + jnp.uint32(1 << LIMB_BITS) - b[i] - borrow
        outs.append(t & MASK)
        borrow = jnp.uint32(1) - (t >> LIMB_BITS)
    return jnp.stack(outs, axis=0), borrow


def cond_sub_p(x, p_col):
    """Canonical limbs possibly in [0, 2p) -> [0, p)."""
    d, borrow = sub_borrow(x, jnp.broadcast_to(p_col, x.shape))
    return jnp.where((borrow == 0)[None, :], d, x)


def mont_mul(a, b, p_col, np_col):
    """Montgomery product abR^{-1} mod p on (16, N) canonical limbs."""
    pb = jnp.broadcast_to(p_col, a.shape)
    npb = jnp.broadcast_to(np_col, a.shape)

    t = conv(a, b)                                             # (32, N)
    t_low, c16 = carry16(t[:L])
    m, _ = carry16(conv_low(t_low, npb))                       # mod R
    mp = conv(m, pb)
    _, carry_low = carry16(t_low + mp[:L])
    head = jnp.pad((c16 + carry_low)[None, :], ((0, L - 1), (0, 0)))
    canon, _ = carry16(t[L:] + mp[L:] + head)                  # < 2p
    return cond_sub_p(canon, p_col)


def add_mod(a, b, p_col):
    """(a + b) mod p, canonical in/out.  a + b < 2p < 2^256: no carry out."""
    s, _ = carry16(a + b)
    return cond_sub_p(s, p_col)


def sub_mod(a, b, p_col):
    """(a - b) mod p, canonical in/out."""
    d, borrow = sub_borrow(a, b)
    fixed, _ = carry16(d + jnp.broadcast_to(p_col, a.shape))
    return jnp.where((borrow == 0)[None, :], d, fixed)


def neg_mod(a, p_col):
    return sub_mod(jnp.zeros_like(a), a, p_col)


def dbl_mod(a, p_col):
    return add_mod(a, a, p_col)


def mul_small(a, k: int, p_col):
    """a * k for tiny static k via an addition chain (k in {2,3,8,9})."""
    if k == 2:
        return dbl_mod(a, p_col)
    if k == 3:
        return add_mod(dbl_mod(a, p_col), a, p_col)
    if k == 8:
        return dbl_mod(dbl_mod(dbl_mod(a, p_col), p_col), p_col)
    if k == 9:
        return add_mod(
            dbl_mod(dbl_mod(dbl_mod(a, p_col), p_col), p_col), a, p_col
        )
    raise ValueError(f"unsupported small multiplier {k}")


# Convenience: baked constants for the two BN254 fields
from .montgomery import FQ as _FQ, FR as _FR  # noqa: E402

FQ_P, FQ_NP = field_consts(_FQ)
FR_P, FR_NP = field_consts(_FR)
