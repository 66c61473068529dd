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
      3. a binary UPSWEEP tree over the sorted points: level t holds
         aligned block sums of 2^t points (log2(N) batched adds of
         halving width, ~N lane-adds total);
      4. inclusive prefixes are materialized ONLY at the B+1 bucket-tail
         positions (each prefix = sum of the <= log2(N) aligned blocks
         named by the set bits of its length -- `_tail_prefix`);
      5. the weighted bucket total sum_b b*S_b collapses by Abel
         summation:  with X_b = prefix through the last element of
         bucket b (X_b = X_{b-1} for empty buckets, X_B = full sum),

            sum_{b=1..B} b * (X_b - X_{b-1})  =  B*X_B - sum_{b<B} X_b.

         Group subtraction is one negation, so the bucket phase needs
         only a log2(B) halving-tree reduction on top of the tails --
         all batched adds, zero sequential scalar work.
  - B*X_B for all windows at once: (c-1) batched doublings of the (W,)
    window prefix-totals after the scan.
  - Windows are combined MSB-first by a Horner ladder (c doublings + one
    add per window) in a `fori_loop` -- the only remaining sequential
    scalar point ops (256 doublings, inherent to the radix ladder).

Cost model: ~N + (B+1)*log2(N) point-add lanes per window.  Two prior
designs were killed by measurement on real hardware: 2B SEQUENTIAL
scalar bucket adds per window (~10:1 of wall time; replaced by Abel
summation) and a full Hillis-Steele prefix scan (N*log2(N) lane-adds
per window, 8x slower end-to-end than the upsweep+tail form at 2^16).

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


def _backend_add(f):
    """Batched complete point-add: fused Pallas kernel on TPU, XLA off."""
    if _use_pallas():
        from ..ec import pallas_curve as PC

        return lambda p, q: PC.point_add(f, p, q)
    return lambda p, q: JC.point_add(f, p, q)


def _tail_prefix(f, add, pts, u, n: int):
    """Inclusive prefix sums of a (n, ...) point batch at tail indices u.

    Work-efficient replacement for a full Hillis-Steele prefix scan
    (n*log2(n) adds) when prefixes are needed at only |u| positions:

      1. upsweep: level t holds the sums of aligned blocks of 2^t
         consecutive points -- log2(n) batched adds of HALVING width,
         ~n lane-adds total;
      2. the prefix over the first m = u+1 points is the sum of the
         aligned blocks named by m's set bits (level t, block index
         (m >> t) - 1) -- log2(n)+1 masked adds at width |u|.

    u = -1 (empty prefix) yields the point at infinity for free: m = 0
    has no set bits, so the accumulator is never touched.

    n need not be a power of two: the batch is padded with points at
    infinity, which can only land in aligned blocks past every tail.
    """
    n2 = max(1, 1 << (n - 1).bit_length()) if n > 1 else 1
    if n2 != n:
        inf = JC.point_infinity(f, (n2 - n,))
        pts = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), pts, inf
        )
    levels = [pts]
    w = n2
    while w > 1:
        cur = levels[-1]
        ev = jax.tree.map(lambda a: a[0::2], cur)
        od = jax.tree.map(lambda a: a[1::2], cur)
        levels.append(add(ev, od))
        w //= 2
    m = u + 1                                             # block counts
    acc = JC.point_infinity(f, m.shape)
    for t, lvl in enumerate(levels):
        wt = max(1, n2 >> t)
        idx = jnp.clip((m >> t) - 1, 0, wt - 1)
        node = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), lvl)
        bit = ((m >> t) & 1) == 1
        acc = JC.point_select(f, bit, add(acc, node), acc)
    return acc


def _tree_sum(f, pts, width: int, add=None):
    """Sum a (width, ...) point batch; width must be a power of two.

    log2(width) halving point-adds (each a separate, shrinking-width
    instantiation -- widths differ so a fori_loop cannot apply)."""
    if add is None:
        add = _backend_add(f)
    while width > 1:
        half = width // 2
        lo = jax.tree.map(lambda a: a[:half], pts)
        hi = jax.tree.map(lambda a: a[half:], pts)
        pts = add(lo, hi)
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
    add = _backend_add(f)

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
        xb = _tail_prefix(f, add, pts, u, n)
        # Abel summation: window total = B*X_B - sum_{b=0..B-1} X_b
        head = _tree_sum(f, jax.tree.map(lambda a: a[:B], xb), B, add)
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
