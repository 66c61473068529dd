// ECDSA over the Ed25519 twisted-Edwards curve (gcrypt-compatible).
//
// Native replacement for the reference's libgcrypt signing layer
// (reference zklaim/zklaim_ecc.c; semantics documented + fixture-verified
// in zklaim_tpu/claims/signing.py): plain-scalar d (big-endian), EdDSA
// compressed public points, r = (kG).x mod L, s = k^-1 (H + r d) mod L,
// H = SHA256(msg) as a big-endian integer.
//
// Arithmetic: 4x64-bit limbs with unsigned __int128 schoolbook multiply.
// GF(2^255-19) reduction folds 2^256 = 38; mod-L uses binary shift-
// subtract over the 512-bit product (sign/verify do only a handful).

#include "ed25519_ecdsa.h"

#include <cstring>

#include "sha256.h"

namespace zklaim_native {

typedef unsigned __int128 u128;

struct U256 {
  uint64_t v[4];  // little-endian limbs
};

static const U256 P = {{0xffffffffffffffedULL, 0xffffffffffffffffULL,
                        0xffffffffffffffffULL, 0x7fffffffffffffffULL}};
static const U256 L = {{0x5812631a5cf5d3edULL, 0x14def9dea2f79cd6ULL,
                        0x0000000000000000ULL, 0x1000000000000000ULL}};

static inline bool geq(const U256& a, const U256& b) {
  for (int i = 3; i >= 0; i--) {
    if (a.v[i] != b.v[i]) return a.v[i] > b.v[i];
  }
  return true;
}

static inline void sub_inplace(U256& a, const U256& b) {
  u128 borrow = 0;
  for (int i = 0; i < 4; i++) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    a.v[i] = (uint64_t)d;
    borrow = (d >> 64) & 1;
  }
}

static inline uint64_t add_inplace(U256& a, const U256& b) {
  u128 carry = 0;
  for (int i = 0; i < 4; i++) {
    u128 s = (u128)a.v[i] + b.v[i] + carry;
    a.v[i] = (uint64_t)s;
    carry = s >> 64;
  }
  return (uint64_t)carry;
}

static inline bool is_zero(const U256& a) {
  return !(a.v[0] | a.v[1] | a.v[2] | a.v[3]);
}

// ---- GF(2^255 - 19) -------------------------------------------------------

// NB: all three operands may alias; work in a temporary.
static void fadd(U256& o, const U256& a, const U256& b) {
  U256 t = a;
  add_inplace(t, b);                     // < 2^256; fold once
  if (geq(t, P)) sub_inplace(t, P);
  if (geq(t, P)) sub_inplace(t, P);
  o = t;
}

static void fsub(U256& o, const U256& a, const U256& b) {
  U256 t = a;
  if (!geq(t, b)) add_inplace(t, P);
  sub_inplace(t, b);
  o = t;
}

// full 512-bit product then fold: 2^256 == 38 (mod p), twice.
static void fmul(U256& o, const U256& a, const U256& b) {
  uint64_t t[8] = {0};
  for (int i = 0; i < 4; i++) {
    u128 carry = 0;
    for (int j = 0; j < 4; j++) {
      u128 cur = (u128)a.v[i] * b.v[j] + t[i + j] + carry;
      t[i + j] = (uint64_t)cur;
      carry = cur >> 64;
    }
    t[i + 4] += (uint64_t)carry;
  }
  // fold high half * 38 into low half
  u128 carry = 0;
  for (int i = 0; i < 4; i++) {
    u128 cur = (u128)t[i] + (u128)t[i + 4] * 38 + carry;
    t[i] = (uint64_t)cur;
    carry = cur >> 64;
  }
  // carry < 38ish: fold again
  u128 c2 = (u128)t[0] + (u128)(uint64_t)carry * 38;
  t[0] = (uint64_t)c2;
  uint64_t c3 = (uint64_t)(c2 >> 64);
  for (int i = 1; i < 4 && c3; i++) {
    u128 cur = (u128)t[i] + c3;
    t[i] = (uint64_t)cur;
    c3 = (uint64_t)(cur >> 64);
  }
  o.v[0] = t[0]; o.v[1] = t[1]; o.v[2] = t[2]; o.v[3] = t[3];
  if (geq(o, P)) sub_inplace(o, P);
  if (geq(o, P)) sub_inplace(o, P);
}

static void fpow(U256& o, const U256& base, const U256& e) {
  U256 acc = {{1, 0, 0, 0}};
  U256 b = base;
  for (int i = 0; i < 256; i++) {
    if ((e.v[i / 64] >> (i % 64)) & 1) fmul(acc, acc, b);
    fmul(b, b, b);
  }
  o = acc;
}

static void finv(U256& o, const U256& a) {
  U256 e = P;
  e.v[0] -= 2;
  fpow(o, a, e);
}

// ---- mod L ----------------------------------------------------------------

static void mod_l(U256& o, const uint64_t t[8]) {
  // binary reduction of a 512-bit value mod L
  U256 r = {{0, 0, 0, 0}};
  for (int bit = 511; bit >= 0; bit--) {
    // r = 2r + bit
    uint64_t top = r.v[3] >> 63;
    for (int i = 3; i > 0; i--) r.v[i] = (r.v[i] << 1) | (r.v[i - 1] >> 63);
    r.v[0] <<= 1;
    r.v[0] |= (t[bit / 64] >> (bit % 64)) & 1;
    if (top || geq(r, L)) sub_inplace(r, L);
  }
  o = r;
}

static void lmul(U256& o, const U256& a, const U256& b) {
  uint64_t t[8] = {0};
  for (int i = 0; i < 4; i++) {
    u128 carry = 0;
    for (int j = 0; j < 4; j++) {
      u128 cur = (u128)a.v[i] * b.v[j] + t[i + j] + carry;
      t[i + j] = (uint64_t)cur;
      carry = cur >> 64;
    }
    t[i + 4] += (uint64_t)carry;
  }
  mod_l(o, t);
}

static void ladd(U256& o, const U256& a, const U256& b) {
  U256 t = a;
  uint64_t c = add_inplace(t, b);
  if (c || geq(t, L)) sub_inplace(t, L);
  o = t;
}

static void linv(U256& o, const U256& a) {
  // Fermat: a^(L-2) mod L
  U256 e = L;
  e.v[0] -= 2;
  U256 acc = {{1, 0, 0, 0}};
  U256 b = a;
  for (int i = 0; i < 256; i++) {
    if ((e.v[i / 64] >> (i % 64)) & 1) lmul(acc, acc, b);
    lmul(b, b, b);
  }
  o = acc;
}

// ---- Edwards curve (extended coordinates, a = -1) -------------------------

// d = -121665/121666 mod p
static const U256 ED_D = {{0x75eb4dca135978a3ULL, 0x00700a4d4141d8abULL,
                           0x8cc740797779e898ULL, 0x52036cee2b6ffe73ULL}};
// 2d
static const U256 ED_2D = {{0xebd69b9426b2f159ULL, 0x00e0149a8283b156ULL,
                            0x198e80f2eef3d130ULL, 0x2406d9dc56dffce7ULL}};
// base point
static const U256 G_X = {{0x8f25d51a216936d3ULL, 0xc9562d608f25d51aULL,
                          0x692cc7609525a7b2ULL, 0x216936d3cd6e53feULL}};

struct Point {
  U256 X, Y, Z, T;  // extended homogeneous: x = X/Z, y = Y/Z, T = XY/Z
};

static const U256 ONE = {{1, 0, 0, 0}};
static const U256 ZERO = {{0, 0, 0, 0}};

static void identity(Point& p) { p.X = ZERO; p.Y = ONE; p.Z = ONE; p.T = ZERO; }

static void pt_add(Point& o, const Point& p, const Point& q) {
  U256 a, b, c, d, e, f, g, h, t1, t2;
  fsub(t1, p.Y, p.X); fsub(t2, q.Y, q.X); fmul(a, t1, t2);
  fadd(t1, p.Y, p.X); fadd(t2, q.Y, q.X); fmul(b, t1, t2);
  fmul(c, p.T, ED_2D); fmul(c, c, q.T);
  fmul(d, p.Z, q.Z); fadd(d, d, d);
  fsub(e, b, a); fsub(f, d, c); fadd(g, d, c); fadd(h, b, a);
  fmul(o.X, e, f); fmul(o.Y, g, h); fmul(o.T, e, h); fmul(o.Z, f, g);
}

static void pt_double(Point& o, const Point& p) {
  U256 a, b, c, dd, e, f, g, h, t;
  fmul(a, p.X, p.X);
  fmul(b, p.Y, p.Y);
  fmul(c, p.Z, p.Z); fadd(c, c, c);
  fsub(dd, P, a); if (geq(dd, P)) sub_inplace(dd, P);  // -A mod p
  fadd(t, p.X, p.Y); fmul(t, t, t);
  fsub(e, t, a); fsub(e, e, b);
  fadd(g, dd, b); fsub(f, g, c); fsub(h, dd, b);
  fmul(o.X, e, f); fmul(o.Y, g, h); fmul(o.T, e, h); fmul(o.Z, f, g);
}

static void pt_mul(Point& o, const U256& k, const Point& p) {
  Point acc;
  identity(acc);
  Point base = p;
  for (int i = 0; i < 256; i++) {
    if ((k.v[i / 64] >> (i % 64)) & 1) pt_add(acc, acc, base);
    pt_double(base, base);
  }
  o = acc;
}

static void pt_affine(U256& x, U256& y, const Point& p) {
  U256 zi;
  finv(zi, p.Z);
  fmul(x, p.X, zi);
  fmul(y, p.Y, zi);
}

// ---- encodings ------------------------------------------------------------

static void be_bytes_to_u256(const uint8_t* b, U256& o) {
  for (int i = 0; i < 4; i++) {
    uint64_t w = 0;
    for (int j = 0; j < 8; j++) w = (w << 8) | b[8 * i + j];
    o.v[3 - i] = w;
  }
}

static void u256_to_be_bytes(const U256& a, uint8_t* b) {
  for (int i = 0; i < 4; i++) {
    uint64_t w = a.v[3 - i];
    for (int j = 7; j >= 0; j--) {
      b[8 * i + j] = (uint8_t)w;
      w >>= 8;
    }
  }
}

static void compress(const Point& p, uint8_t out[32]) {
  U256 x, y;
  pt_affine(x, y, p);
  for (int i = 0; i < 4; i++)
    for (int j = 0; j < 8; j++) out[8 * i + j] = (uint8_t)(y.v[i] >> (8 * j));
  out[31] |= (uint8_t)((x.v[0] & 1) << 7);
}

static bool decompress(const uint8_t in[32], Point& p) {
  U256 y;
  for (int i = 0; i < 4; i++) {
    uint64_t w = 0;
    for (int j = 7; j >= 0; j--) w = (w << 8) | in[8 * i + j];
    y.v[i] = w;
  }
  int sign = y.v[3] >> 63;
  y.v[3] &= 0x7fffffffffffffffULL;
  if (geq(y, P)) return false;
  // x^2 = (y^2 - 1) / (d y^2 + 1)
  U256 yy, num, den, deninv, x2, x;
  fmul(yy, y, y);
  fsub(num, yy, ONE);
  fmul(den, ED_D, yy);
  fadd(den, den, ONE);
  finv(deninv, den);
  fmul(x2, num, deninv);
  // sqrt: x = x2^((p+3)/8); if x^2 != x2, x *= 2^((p-1)/4)
  U256 e = P;  // (p+3)/8: p = 2^255-19 -> (p+3)/8 = 2^252 - 2
  e.v[0] = 0xfffffffffffffffeULL;
  e.v[1] = 0xffffffffffffffffULL;
  e.v[2] = 0xffffffffffffffffULL;
  e.v[3] = 0x0fffffffffffffffULL;
  fpow(x, x2, e);
  U256 chk;
  fmul(chk, x, x);
  if (std::memcmp(&chk, &x2, sizeof(U256)) != 0) {
    // multiply by sqrt(-1) = 2^((p-1)/4)
    U256 sqm1, two = {{2, 0, 0, 0}}, e2 = {{0xfffffffffffffffbULL,
        0xffffffffffffffffULL, 0xffffffffffffffffULL, 0x1fffffffffffffffULL}};
    fpow(sqm1, two, e2);  // (p-1)/4 = 2^253 - 5
    fmul(x, x, sqm1);
    fmul(chk, x, x);
    if (std::memcmp(&chk, &x2, sizeof(U256)) != 0) return false;
  }
  if ((int)(x.v[0] & 1) != sign) fsub(x, P, x);
  p.X = x;
  p.Y = y;
  p.Z = ONE;
  fmul(p.T, x, y);
  return true;
}

static void base_point(Point& g) {
  uint8_t enc[32];
  // y = 4/5 mod p; recompute from constants to avoid a second table
  U256 five = {{5, 0, 0, 0}}, four = {{4, 0, 0, 0}}, fiveinv, y;
  finv(fiveinv, five);
  fmul(y, four, fiveinv);
  for (int i = 0; i < 4; i++)
    for (int j = 0; j < 8; j++) enc[8 * i + j] = (uint8_t)(y.v[i] >> (8 * j));
  // x is the even root
  decompress(enc, g);
}

// ---- ECDSA ----------------------------------------------------------------

int ecdsa_sign(const uint8_t* msg, size_t len, const uint8_t priv64[64],
               const uint8_t k_bytes[32], uint8_t sig64[64]) {
  U256 d, k, h, r, s;
  be_bytes_to_u256(priv64 + 32, d);
  be_bytes_to_u256(k_bytes, k);
  // reduce k into [1, L)
  uint64_t t8[8] = {k.v[0], k.v[1], k.v[2], k.v[3], 0, 0, 0, 0};
  mod_l(k, t8);
  if (is_zero(k)) return 1;

  uint8_t dgst[32];
  sha256(msg, len, dgst);
  be_bytes_to_u256(dgst, h);
  uint64_t h8[8] = {h.v[0], h.v[1], h.v[2], h.v[3], 0, 0, 0, 0};
  mod_l(h, h8);

  Point g, rp;
  base_point(g);
  pt_mul(rp, k, g);
  U256 rx, ry;
  pt_affine(rx, ry, rp);
  uint64_t rx8[8] = {rx.v[0], rx.v[1], rx.v[2], rx.v[3], 0, 0, 0, 0};
  mod_l(r, rx8);
  if (is_zero(r)) return 1;

  U256 kinv, rd, sum;
  linv(kinv, k);
  lmul(rd, r, d);
  ladd(sum, h, rd);
  lmul(s, kinv, sum);
  if (is_zero(s)) return 1;

  u256_to_be_bytes(r, sig64);
  u256_to_be_bytes(s, sig64 + 32);
  return 0;
}

int ecdsa_verify(const uint8_t* msg, size_t len, const uint8_t sig64[64],
                 const uint8_t pub32[32]) {
  U256 r, s, h;
  be_bytes_to_u256(sig64, r);
  be_bytes_to_u256(sig64 + 32, s);
  if (is_zero(r) || is_zero(s) || geq(r, L) || geq(s, L)) return 1;

  Point q;
  if (!decompress(pub32, q)) return 1;

  uint8_t dgst[32];
  sha256(msg, len, dgst);
  be_bytes_to_u256(dgst, h);
  uint64_t h8[8] = {h.v[0], h.v[1], h.v[2], h.v[3], 0, 0, 0, 0};
  mod_l(h, h8);

  U256 w, u1, u2;
  linv(w, s);
  lmul(u1, h, w);
  lmul(u2, r, w);

  Point g, p1, p2, sum;
  base_point(g);
  pt_mul(p1, u1, g);
  pt_mul(p2, u2, q);
  pt_add(sum, p1, p2);
  U256 x, y;
  pt_affine(x, y, sum);
  uint64_t x8[8] = {x.v[0], x.v[1], x.v[2], x.v[3], 0, 0, 0, 0};
  U256 xmodl;
  mod_l(xmodl, x8);
  return std::memcmp(&xmodl, &r, sizeof(U256)) == 0 ? 0 : 1;
}

int ecdsa_pub_from_priv(const uint8_t priv64[64], uint8_t pub32[32]) {
  U256 d;
  be_bytes_to_u256(priv64 + 32, d);
  Point g, q;
  base_point(g);
  pt_mul(q, d, g);
  compress(q, pub32);
  return 0;
}

}  // namespace zklaim_native
