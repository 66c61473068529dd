"""Multi-scalar multiplication (Pippenger) over BN254 G1/G2 for TPU.

TPU-native replacement for libsnark/libff's multi_exp (reference reaches
it inside r1cs_gg_ppzksnark generator/prover; SURVEY.md §2.6 row 3, OpenMP
`MULTICORE` flag reference CMakeLists.txt:35-39).

Vectorization strategy (XLA static shapes; no data-dependent scatters,
and -- critically for TPU -- NO sequential scalar point ops anywhere in
the per-window path):

  - Scalars are split into W = 256/c signed c-bit digits (window size
    c | 16 so digits slice cleanly out of 16-bit limbs).  Signed digits
    halve the bucket count: B = 2^(c-1).
  - One `lax.scan` over windows compiles the window body once.  Per
    window:
      1. points are sign-adjusted (negate y where digit < 0; infinity
         where digit == 0) -- pure elementwise masks;
      2. `lax.sort_key_val` groups equal digits;
      3. an UNSEGMENTED inclusive prefix scan P of the sorted points
         (Hillis-Steele: log2(N) rounds, each ONE batched complete
         point-add over all N lanes);
      4. the weighted bucket total sum_b b*S_b collapses by Abel
         summation:  with X_b = P[tail(b)] (prefix through the last
         element of bucket b; X_b = X_{b-1} for empty buckets and
         X_B = P[N-1]),

            sum_{b=1..B} b * (X_b - X_{b-1})  =  B*X_B - sum_{b<B} X_b.

         Group subtraction is one negation, so the whole bucket phase is
         a static `searchsorted` gather of B points plus a log2(B)
         halving-tree reduction -- all full-width batched adds, zero
         sequential scalar work.
  - B*X_B for all windows at once: (c-1) batched doublings of the (W,)
    window prefix-totals after the scan.
  - Windows are combined MSB-first by a Horner ladder (c doublings + one
    add per window) in a `fori_loop` -- the only remaining sequential
    scalar point ops (256 doublings, inherent to the radix ladder).

Cost model: ~N*log2(N) point-add lanes per window for the prefix scan
(every add at full vector width) + ~B lanes for the bucket tree.  The
previous design additionally ran 2B SEQUENTIAL scalar point-adds per
window (bucket reduction fori_loop) which dominated wall time ~10:1 on
real hardware; Abel summation removes that term entirely.

Multi-chip: shard the point axis; each chip runs this kernel on its
slice and the per-chip partial results are combined with one
all-gather + fold -- see parallel/ for the shard_map wrapper.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..ec import jaxcurve as JC
from ..ff.limbs import LIMB_BITS, NUM_LIMBS


def _use_pallas() -> bool:
    """Fused Pallas scan rounds on real TPUs (33 ns/lane vs ~2 us/lane
    through XLA); tests opt in on CPU via interpret mode."""
    if os.environ.get("ZKLAIM_MSM_PALLAS") == "0":
        return False
    return (
        jax.default_backend() == "tpu"
        or os.environ.get("ZKLAIM_MSM_PALLAS") == "1"
    )


def signed_digits(scalars, c: int):
    """(N, 16) plain-domain u32 limbs -> (W, N) int32 signed digits.

    Digits lie in [-2^(c-1), 2^(c-1)]; windows are LSB-first.  Requires
    c | 16 and scalars < 2^254 (true for Fr), so the final carry is
    absorbed by the top window.
    """
    if LIMB_BITS % c:
        raise ValueError("window size must divide 16")
    per_limb = LIMB_BITS // c
    W = NUM_LIMBS * per_limb
    mask = (1 << c) - 1
    half = 1 << (c - 1)

    raw = []
    for w in range(W):
        limb = scalars[:, w // per_limb].astype(jnp.int32)
        raw.append((limb >> (c * (w % per_limb))) & mask)

    out = []
    carry = jnp.zeros_like(raw[0])
    for w in range(W):
        d = raw[w] + carry
        ge = d > half
        carry = ge.astype(jnp.int32)
        out.append(jnp.where(ge, d - (1 << c), d))
    return jnp.stack(out, axis=0)


def _prefix_scan_points(f, pts, n: int):
    """Unsegmented inclusive prefix sum of a (n, ...) point batch.

    Hillis-Steele with a jnp.roll shift: log2(n) rounds, ONE point_add
    instantiation reused by the fori_loop (compile-time lean)."""
    logn = max(1, (n - 1).bit_length())
    idx = jnp.arange(n)

    def body(t, p):
        d = jnp.int32(1) << t
        shifted = jax.tree.map(lambda a: jnp.roll(a, d, axis=0), p)
        valid = idx >= d
        combined = JC.point_add(f, p, shifted)
        return JC.point_select(f, valid, combined, p)

    return lax.fori_loop(0, logn, body, pts)


def _tree_sum(f, pts, width: int):
    """Sum a (width, ...) point batch; width must be a power of two.

    log2(width) halving point-adds (each a separate, shrinking-width
    instantiation -- widths differ so a fori_loop cannot apply)."""
    while width > 1:
        half = width // 2
        lo = jax.tree.map(lambda a: a[:half], pts)
        hi = jax.tree.map(lambda a: a[half:], pts)
        pts = JC.point_add(f, lo, hi)
        width = half
    return jax.tree.map(lambda a: a[0], pts)


def _dbl_k(f, p, k: int):
    """k batched doublings (fori_loop: one instantiation)."""
    if k == 0:
        return p
    return lax.fori_loop(0, k, lambda i, a: JC.point_double(f, a), p)


# Max point-axis batch per compiled window kernel.  Two reasons:
#   1. device limits: very wide G2 window kernels have hit TPU "kernel
#      fault" crashes at batch 2^15; 2^14 is stable.  G1 is stable at 2^15.
#   2. shape bucketing: any larger MSM runs as a lax.scan over fixed
#      chunks, so arbitrarily sized inputs share ONE compiled kernel.
MAX_CHUNK = {1: 1 << 15, 2: 1 << 14}


def _msm_chunked(f, pts_c, sc_c, c):
    """Scan msm over (k, chunk, ...) stacked chunks, summing partials."""

    def body(acc, xs):
        pts, sc = xs
        part = msm(f, pts, sc, c)
        return JC.point_add(f, acc, part), None

    acc, _ = lax.scan(body, JC.point_infinity(f), (pts_c, sc_c))
    return acc


def msm_pow2(f, points, scalars, c: int = 8):
    """msm() with the point axis padded to a power of two and large
    inputs split into fixed-size chunks (see MAX_CHUNK)."""
    n = jax.tree.leaves(points)[0].shape[0]
    n2 = max(2, 1 << (n - 1).bit_length()) if n > 1 else 2
    chunk = MAX_CHUNK[f.deg]
    if n2 > chunk:
        n2 = ((n + chunk - 1) // chunk) * chunk
    if n2 != n:
        inf = JC.point_infinity(f, (n2 - n,))
        points = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), points, inf
        )
        scalars = jnp.pad(scalars, ((0, n2 - n), (0, 0)))
    if n2 <= chunk:
        return _msm_jit(f, points, scalars, c)
    k = n2 // chunk
    pts_c = jax.tree.map(lambda a: a.reshape((k, chunk) + a.shape[1:]), points)
    sc_c = scalars.reshape(k, chunk, scalars.shape[-1])
    return _msm_chunked_jit(f, pts_c, sc_c, c)


def msm(f, points, scalars, c: int = 8):
    """Multi-scalar multiplication: sum_i scalars[i] * points[i].

    f: JC.FQ_OPS (G1) or JC.FQ2_OPS (G2) -- pass statically under jit.
    points: projective pytree, batch (N,).
    scalars: (N, 16) u32 plain-domain (NOT Montgomery) Fr limbs.
    Returns a projective point pytree with scalar batch shape ().
    """
    n = jax.tree.leaves(points)[0].shape[0]
    digits = signed_digits(scalars, c)                     # (W, N)
    W = digits.shape[0]
    B = 1 << (c - 1)
    bucket_vals = jnp.arange(0, B + 1, dtype=jnp.int32)    # tails of b = 0..B

    def window_body(carry, d_w):
        mag = jnp.abs(d_w)
        x, y, z = points
        y = f.select(d_w < 0, f.neg(y), y)
        # digit 0 -> point at infinity (0, y, 0); y != 0 for curve points
        zeros = f.zeros(JC._batch_shape(f, z))
        x = f.select(mag == 0, zeros, x)
        z = f.select(mag == 0, zeros, z)
        keys, order = lax.sort_key_val(mag, jnp.arange(n, dtype=jnp.int32))
        pts = jax.tree.map(lambda a: jnp.take(a, order, axis=0), (x, y, z))
        # X_b = prefix at the last element with key <= b (identity if none)
        u = jnp.searchsorted(keys, bucket_vals, side="right") - 1   # (B+1,)
        u_cl = jnp.clip(u, 0, n - 1)
        if _use_pallas():
            from ..ec import pallas_curve as PC

            prefix_soa = PC.prefix_scan_soa(f, PC.to_soa(f, pts), n)
            lane_axis = 1 if f.deg == 1 else 2
            tails = tuple(
                jnp.take(c, u_cl, axis=lane_axis) for c in prefix_soa
            )
            xb = PC.from_soa(f, tails)
        else:
            prefix = _prefix_scan_points(f, pts, n)
            xb = jax.tree.map(lambda a: jnp.take(a, u_cl, axis=0), prefix)
        xb = JC.point_select(f, u >= 0, xb, JC.point_infinity(f, (B + 1,)))
        # Abel summation: window total = B*X_B - sum_{b=0..B-1} X_b
        head = _tree_sum(f, jax.tree.map(lambda a: a[:B], xb), B)
        total = jax.tree.map(lambda a: a[B], xb)                    # X_B
        return carry, (total, head)

    _, (tot_w, head_w) = lax.scan(window_body, None, digits)   # (W, ...) each
    window_pts = JC.point_add(f, _dbl_k(f, tot_w, c - 1), JC.point_neg(f, head_w))

    def horner(w, acc):
        acc = _dbl_k(f, acc, c)
        pw = jax.tree.map(
            lambda a: lax.dynamic_index_in_dim(a, W - 1 - w, 0, keepdims=False),
            window_pts,
        )
        return JC.point_add(f, acc, pw)

    init = JC.point_infinity(f)
    return lax.fori_loop(0, W, horner, init)


# Module-level jit wrappers: a fresh jax.jit() per call would re-trace the
# (large) windowed graph on every invocation even when the compiled
# executable is cached persistently.
_msm_jit = jax.jit(msm, static_argnums=(0, 3))
_msm_chunked_jit = jax.jit(_msm_chunked, static_argnums=(0, 3))
