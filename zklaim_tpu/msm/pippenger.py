"""Multi-scalar multiplication (Pippenger) over BN254 G1/G2 for TPU.

TPU-native replacement for libsnark/libff's multi_exp (reference reaches
it inside r1cs_gg_ppzksnark generator/prover; SURVEY.md §2.6 row 3, OpenMP
`MULTICORE` flag reference CMakeLists.txt:35-39).

Vectorization strategy (XLA static shapes; no data-dependent scatters):
  - Scalars are split into W = 256/c signed c-bit digits (window size
    c ∈ {4, 8, 16} so digits slice cleanly out of 16-bit limbs).  Signed
    digits halve the bucket count: B = 2^(c-1).
  - One `lax.scan` over windows compiles the window body once.  Per
    window:
      1. points are sign-adjusted (negate y where digit < 0; infinity
         where digit == 0) -- pure elementwise masks;
      2. `lax.sort_key_val` groups equal digits;
      3. bucket sums = segmented inclusive scan (Hillis-Steele): log2(N)
         rounds, each ONE batched unified point-add over all N lanes --
         the branchless add from ec.jaxcurve is safe as a combiner;
      4. per-bucket tails are gathered with a static `searchsorted`;
      5. the weighted bucket reduction sum_b b*S_b uses the suffix-sum
         identity: T_j = sum_{b>=j} S_b, answer = sum_j T_j -- one
         reversed `associative_scan` plus a log2(B) tree reduction.
  - Windows are combined MSB-first by a Horner ladder (c doublings + one
    add per window) in a `fori_loop`.

Cost model: the segmented scan does N*log2(N) point-adds per window
(vs N for a scalar-CPU Pippenger) but every add runs at full vector
width; wall time is bandwidth/VPU-bound, not dispatch-bound.  A
work-efficient Pallas bucket kernel is the planned upgrade path.

Multi-chip: shard the point axis; each chip runs this kernel on its
slice and the (tiny) per-window bucket sums are combined with psum --
see parallel/ for the shard_map wrapper.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..ec import jaxcurve as JC
from ..ff.limbs import LIMB_BITS, NUM_LIMBS


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


def _segmented_bucket_sums(f, keys, pts, n_buckets: int):
    """Sorted-key segmented reduction -> (n_buckets,) bucket points.

    keys: (N,) int32 sorted ascending, 0 = "no contribution".
    pts:  jac pytree batched (N, ...).
    Bucket j (j = 1..n_buckets) receives the sum of points with key j.
    """
    n = keys.shape[0]
    logn = max(1, (n - 1).bit_length())
    idx = jnp.arange(n)

    def body(t, p):
        d = jnp.int32(1) << t
        shifted = jax.tree.map(lambda a: jnp.roll(a, d, axis=0), p)
        same = jnp.roll(keys, d) == keys
        valid = jnp.logical_and(idx >= d, same)
        combined = JC.point_add(f, p, shifted)
        return JC.point_select(f, valid, combined, p)

    scanned = lax.fori_loop(0, logn, body, pts)

    bucket_vals = jnp.arange(1, n_buckets + 1, dtype=keys.dtype)
    pos = jnp.searchsorted(keys, bucket_vals, side="right") - 1
    pos_c = jnp.clip(pos, 0, n - 1)
    tails = jax.tree.map(lambda a: jnp.take(a, pos_c, axis=0), scanned)
    has = jnp.logical_and(pos >= 0, jnp.take(keys, pos_c) == bucket_vals)
    inf = JC.point_infinity(f, (n_buckets,))
    return JC.point_select(f, has, tails, inf)


def _weighted_bucket_reduce(f, buckets):
    """sum_b (b+1) * buckets[b] by the classic descending running sum.

    running += bucket[b]; total += running  (b = B-1 .. 0) gives
    total = sum_b (b+1)*bucket[b].  A fori_loop keeps the compiled graph
    at exactly TWO point-add instantiations -- compile time, not runtime,
    is the scarce resource for these wide-limb kernels (a log-depth
    suffix scan instantiates ~log B adds and blows up XLA compile).
    """
    B = jax.tree.leaves(buckets)[0].shape[0]

    def body(i, carry):
        running, total = carry
        pt = jax.tree.map(
            lambda a: lax.dynamic_index_in_dim(a, B - 1 - i, 0, keepdims=False),
            buckets,
        )
        running = JC.point_add(f, running, pt)
        total = JC.point_add(f, total, running)
        return running, total

    init = (JC.point_infinity(f), JC.point_infinity(f))
    _, total = lax.fori_loop(0, B, body, init)
    return total


# Max point-axis batch per compiled window kernel.  Two reasons:
#   1. device limits: the G2 window kernel crashes the TPU ("kernel
#      fault") at batch 2^15; 2^14 is stable.  G1 is stable at 2^15.
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
    points: Jacobian pytree, batch (N,).
    scalars: (N, 16) u32 plain-domain (NOT Montgomery) Fr limbs.
    Returns a Jacobian point pytree with scalar batch shape ().
    """
    n = jax.tree.leaves(points)[0].shape[0]
    digits = signed_digits(scalars, c)                     # (W, N)
    n_buckets = 1 << (c - 1)

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
        buckets = _segmented_bucket_sums(f, keys, pts, n_buckets)
        return carry, _weighted_bucket_reduce(f, buckets)

    _, window_pts = lax.scan(window_body, None, digits)    # (W, ...)
    W = digits.shape[0]

    def horner(w, acc):
        def dbl(_, a):
            return JC.point_double(f, a)

        acc = lax.fori_loop(0, c, dbl, acc)
        pw = jax.tree.map(lambda a: lax.dynamic_index_in_dim(a, W - 1 - w, 0, keepdims=False), window_pts)
        return JC.point_add(f, acc, pw)

    init = JC.point_infinity(f)
    return lax.fori_loop(0, W, horner, init)


# Module-level jit wrappers: a fresh jax.jit() per call would re-trace the
# (large) windowed graph on every invocation even when the compiled
# executable is cached persistently.
_msm_jit = jax.jit(msm, static_argnums=(0, 3))
_msm_chunked_jit = jax.jit(_msm_chunked, static_argnums=(0, 3))
