"""Durable byte formats for Groth16 keys and proofs.

Replaces the reference's libsnark iostream export/import
(zklaim/libsnark_wrapper.cpp:122-192).  The reference's pk/vk/proof byte
format is whatever the libsnark submodule's operator<< emits; the
requirement is self round-trip (SURVEY.md §2.4), so this module defines
a compact binary layout:

  G1 point: 64 B  = x || y, 32-byte big-endian each; infinity = zeros.
  G2 point: 128 B = x.c0 || x.c1 || y.c0 || y.c1.
  proof  : "ZKPF" || A:G1 || B:G2 || C:G1                    (260 B)
  vk     : "ZKVK" || u32 n_ic || alpha:G1 || beta:G2 ||
           gamma:G2 || delta:G2 || ic[n_ic]:G1
  pk     : "ZKPK" || u32 num_payloads, num_vars, num_primary, m ||
           alpha:G1 beta:G1 delta:G1 beta:G2 delta:G2 ||
           a[num_vars]:G1 b1[num_vars]:G1 b2[num_vars]:G2 ||
           h[m-1]:G1 l[num_vars-num_primary-1]:G1

All integers are little-endian u32.  Point-array conversions are
vectorized numpy/device paths (no per-element Python ints).
"""

from __future__ import annotations

import struct

import numpy as np

import jax
import jax.numpy as jnp

from ..ec import jaxcurve as JC
from ..ec.hostcurve import CurvePoint, g1_infinity, g2_infinity, g1_point, B_G2
from ..ff.hostfield import Fq, Fq2
from ..ff.limbs import NUM_LIMBS
from ..groth16.api import Proof, ProvingKey, VerifyingKey

MAGIC_PK = b"ZKPK"
MAGIC_VK = b"ZKVK"
MAGIC_PF = b"ZKPF"


# -- numpy limb <-> big-endian byte conversion ------------------------------


def limbs_to_be_bytes(limbs: np.ndarray) -> np.ndarray:
    """(..., 16) u32 canonical limbs -> (..., 32) uint8 big-endian."""
    le = np.ascontiguousarray(np.asarray(limbs), dtype=np.uint32).astype("<u2")
    raw = le.view(np.uint8).reshape(le.shape[:-1] + (2 * NUM_LIMBS,))
    return raw[..., ::-1]


def be_bytes_to_limbs(raw: np.ndarray) -> np.ndarray:
    """(..., 32) uint8 big-endian -> (..., 16) u32 limbs."""
    le = np.ascontiguousarray(np.asarray(raw, dtype=np.uint8)[..., ::-1])
    return le.view("<u2").astype(np.uint32)


def g1_batch_to_bytes(pts) -> bytes:
    x, y, inf = jax.jit(JC.proj_to_affine_limbs, static_argnums=0)(JC.FQ_OPS, pts)
    xb = limbs_to_be_bytes(np.asarray(x))
    yb = limbs_to_be_bytes(np.asarray(y))
    return np.concatenate([xb, yb], axis=-1).tobytes()


def g2_batch_to_bytes(pts) -> bytes:
    x, y, inf = jax.jit(JC.proj_to_affine_limbs, static_argnums=0)(JC.FQ2_OPS, pts)
    xb = limbs_to_be_bytes(np.asarray(x)).reshape(-1, 64)
    yb = limbs_to_be_bytes(np.asarray(y)).reshape(-1, 64)
    return np.concatenate([xb, yb], axis=-1).tobytes()


def g1_batch_from_bytes(raw: bytes, n: int):
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(n, 64)
    x = be_bytes_to_limbs(arr[:, :32])
    y = be_bytes_to_limbs(arr[:, 32:])
    inf = ~np.logical_or(x.any(axis=-1), y.any(axis=-1))
    return jax.jit(JC.affine_limbs_to_proj, static_argnums=0)(
        JC.FQ_OPS, jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf)
    )


def g2_batch_from_bytes(raw: bytes, n: int):
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(n, 128)
    x = be_bytes_to_limbs(arr[:, :64].reshape(n, 2, 32))
    y = be_bytes_to_limbs(arr[:, 64:].reshape(n, 2, 32))
    inf = ~np.logical_or(x.any(axis=(-1, -2)), y.any(axis=(-1, -2)))
    return jax.jit(JC.affine_limbs_to_proj, static_argnums=0)(
        JC.FQ2_OPS, jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf)
    )


# -- host CurvePoint <-> bytes (single points) ------------------------------


def g1_point_to_bytes(p: CurvePoint) -> bytes:
    if p.inf:
        return bytes(64)
    return p.x.v.to_bytes(32, "big") + p.y.v.to_bytes(32, "big")


def g1_point_from_bytes(raw: bytes) -> CurvePoint:
    if raw == bytes(64):
        return g1_infinity()
    return g1_point(int.from_bytes(raw[:32], "big"), int.from_bytes(raw[32:], "big"))


def g2_point_to_bytes(p: CurvePoint) -> bytes:
    if p.inf:
        return bytes(128)
    return b"".join(
        v.to_bytes(32, "big") for v in (p.x.c0, p.x.c1, p.y.c0, p.y.c1)
    )


def g2_point_from_bytes(raw: bytes) -> CurvePoint:
    if raw == bytes(128):
        return g2_infinity()
    c = [int.from_bytes(raw[i : i + 32], "big") for i in range(0, 128, 32)]
    return CurvePoint(Fq2(c[0], c[1]), Fq2(c[2], c[3]), B_G2)


# -- proof ------------------------------------------------------------------


def proof_to_bytes(proof: Proof) -> bytes:
    return (
        MAGIC_PF
        + g1_point_to_bytes(proof.a)
        + g2_point_to_bytes(proof.b)
        + g1_point_to_bytes(proof.c)
    )


def proof_from_bytes(raw: bytes) -> Proof:
    assert raw[:4] == MAGIC_PF, "bad proof magic"
    return Proof(
        a=g1_point_from_bytes(raw[4:68]),
        b=g2_point_from_bytes(raw[68:196]),
        c=g1_point_from_bytes(raw[196:260]),
    )


# -- verification key -------------------------------------------------------


def vk_to_bytes(vk: VerifyingKey) -> bytes:
    out = [MAGIC_VK, struct.pack("<I", len(vk.ic))]
    out.append(g1_point_to_bytes(vk.alpha_g1))
    out.append(g2_point_to_bytes(vk.beta_g2))
    out.append(g2_point_to_bytes(vk.gamma_g2))
    out.append(g2_point_to_bytes(vk.delta_g2))
    for p in vk.ic:
        out.append(g1_point_to_bytes(p))
    return b"".join(out)


def vk_from_bytes(raw: bytes) -> VerifyingKey:
    assert raw[:4] == MAGIC_VK, "bad vk magic"
    (n_ic,) = struct.unpack_from("<I", raw, 4)
    o = 8
    alpha = g1_point_from_bytes(raw[o : o + 64]); o += 64
    beta = g2_point_from_bytes(raw[o : o + 128]); o += 128
    gamma = g2_point_from_bytes(raw[o : o + 128]); o += 128
    delta = g2_point_from_bytes(raw[o : o + 128]); o += 128
    ic = []
    for _ in range(n_ic):
        ic.append(g1_point_from_bytes(raw[o : o + 64])); o += 64
    return VerifyingKey(alpha_g1=alpha, beta_g2=beta, gamma_g2=gamma, delta_g2=delta, ic=ic)


# -- proving key ------------------------------------------------------------


def pk_to_bytes(pk: ProvingKey, num_payloads: int) -> bytes:
    out = [
        MAGIC_PK,
        struct.pack("<IIII", num_payloads, pk.num_vars, pk.num_primary, pk.m),
        g1_point_to_bytes(pk.alpha_g1),
        g1_point_to_bytes(pk.beta_g1),
        g1_point_to_bytes(pk.delta_g1),
        g2_point_to_bytes(pk.beta_g2),
        g2_point_to_bytes(pk.delta_g2),
        g1_batch_to_bytes(pk.a_g1),
        g1_batch_to_bytes(pk.b_g1),
        g2_batch_to_bytes(pk.b_g2),
        g1_batch_to_bytes(pk.h_g1),
        g1_batch_to_bytes(pk.l_g1),
    ]
    return b"".join(out)


def pk_from_bytes(raw: bytes) -> tuple[ProvingKey, int]:
    assert raw[:4] == MAGIC_PK, "bad pk magic"
    num_payloads, num_vars, num_primary, m = struct.unpack_from("<IIII", raw, 4)
    o = 20
    alpha = g1_point_from_bytes(raw[o : o + 64]); o += 64
    beta1 = g1_point_from_bytes(raw[o : o + 64]); o += 64
    delta1 = g1_point_from_bytes(raw[o : o + 64]); o += 64
    beta2 = g2_point_from_bytes(raw[o : o + 128]); o += 128
    delta2 = g2_point_from_bytes(raw[o : o + 128]); o += 128
    n_aux = num_vars - num_primary - 1
    a = g1_batch_from_bytes(raw[o : o + 64 * num_vars], num_vars); o += 64 * num_vars
    b1 = g1_batch_from_bytes(raw[o : o + 64 * num_vars], num_vars); o += 64 * num_vars
    b2 = g2_batch_from_bytes(raw[o : o + 128 * num_vars], num_vars); o += 128 * num_vars
    h = g1_batch_from_bytes(raw[o : o + 64 * (m - 1)], m - 1); o += 64 * (m - 1)
    l = g1_batch_from_bytes(raw[o : o + 64 * n_aux], n_aux); o += 64 * n_aux
    pk = ProvingKey(
        num_vars=num_vars, num_primary=num_primary, m=m,
        alpha_g1=alpha, beta_g1=beta1, delta_g1=delta1,
        beta_g2=beta2, delta_g2=delta2,
        a_g1=a, b_g1=b1, b_g2=b2, h_g1=h, l_g1=l,
    )
    return pk, num_payloads
