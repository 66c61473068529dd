// C ABI surface of the native host library (loaded via ctypes).
//
// Native replacement for the reference's host-side native layer:
//   - SHA256       (reference zklaim/zklaim_hash.c via libgcrypt)
//   - ECDSA-Ed25519 sign/verify (reference zklaim/zklaim_ecc.c)
//   - context wire codec (reference zklaim/zklaim.c:325-436)
//
// Build: make -C native   ->  native/libzklaim_host.so

#include <cstring>

#include "ed25519_ecdsa.h"
#include "sha256.h"

extern "C" {

void zkn_sha256(const uint8_t* data, size_t len, uint8_t out[32]) {
  zklaim_native::sha256(data, len, out);
}

int zkn_ecdsa_sign(const uint8_t* msg, size_t len, const uint8_t priv64[64],
                   const uint8_t k32[32], uint8_t sig64[64]) {
  return zklaim_native::ecdsa_sign(msg, len, priv64, k32, sig64);
}

int zkn_ecdsa_verify(const uint8_t* msg, size_t len, const uint8_t sig64[64],
                     const uint8_t pub32[32]) {
  return zklaim_native::ecdsa_verify(msg, len, sig64, pub32);
}

int zkn_ecdsa_pub(const uint8_t priv64[64], uint8_t pub32[32]) {
  return zklaim_native::ecdsa_pub_from_priv(priv64, pub32);
}

// ---- context wire codec ---------------------------------------------------
// Layout constants mirror the x86-64 C structs of the reference
// (zklaim.h:64-80; verified sizes: payload 160 B, header 80 B).

static const size_t PAYLOAD_SIZE = 160;
static const size_t HEADER_SIZE = 80;
static const size_t SIG_SIZE = 64;

static uint32_t rd_be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

static void wr_be32(uint8_t* p, uint32_t v) {
  p[0] = uint8_t(v >> 24);
  p[1] = uint8_t(v >> 16);
  p[2] = uint8_t(v >> 8);
  p[3] = uint8_t(v);
}

// total size needed for a context wire buffer
size_t zkn_ctx_wire_size(uint32_t n_payloads, uint32_t vk_size,
                         uint32_t proof_size) {
  return HEADER_SIZE + size_t(n_payloads) * PAYLOAD_SIZE + vk_size + SIG_SIZE +
         proof_size;
}

// serialize: caller provides payloads as n*160 raw bytes (already packed)
int zkn_ctx_serialize(const uint8_t* payloads, uint32_t n_payloads,
                      const uint8_t* vk, uint32_t vk_size, const uint8_t* sig,
                      const uint8_t* proof, uint32_t proof_size,
                      const uint8_t pub_key[32], uint8_t* out) {
  uint8_t* h = out;
  std::memset(h, 0, HEADER_SIZE);
  wr_be32(h, n_payloads);
  wr_be32(h + 4, vk_size);
  wr_be32(h + 8, SIG_SIZE);
  wr_be32(h + 12, proof_size);
  std::memcpy(h + 16, pub_key, 32);
  zklaim_native::sha256(h, 48, h + 48);
  uint8_t* p = out + HEADER_SIZE;
  std::memcpy(p, payloads, size_t(n_payloads) * PAYLOAD_SIZE);
  p += size_t(n_payloads) * PAYLOAD_SIZE;
  std::memcpy(p, vk, vk_size);
  p += vk_size;
  std::memcpy(p, sig, SIG_SIZE);
  p += SIG_SIZE;
  if (proof_size) std::memcpy(p, proof, proof_size);
  return 0;
}

// parse + validate header; returns 0 and fills sizes, or nonzero error
int zkn_ctx_parse_header(const uint8_t* buf, size_t len, uint32_t* n_payloads,
                         uint32_t* vk_size, uint32_t* proof_size) {
  if (len < HEADER_SIZE) return 1;
  uint8_t digest[32];
  zklaim_native::sha256(buf, 48, digest);
  if (std::memcmp(digest, buf + 48, 32) != 0) return 2;
  uint32_t n = rd_be32(buf), vks = rd_be32(buf + 4), pfs = rd_be32(buf + 12);
  if (len != zkn_ctx_wire_size(n, vks, pfs)) return 3;
  *n_payloads = n;
  *vk_size = vks;
  *proof_size = pfs;
  return 0;
}

}  // extern "C"
