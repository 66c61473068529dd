#pragma once
#include <cstddef>
#include <cstdint>

namespace zklaim_native {
// priv64 = q(32B compressed pub) || d(32B big-endian scalar); sig = r||s BE.
int ecdsa_sign(const uint8_t* msg, size_t len, const uint8_t priv64[64],
               const uint8_t k_bytes[32], uint8_t sig64[64]);
int ecdsa_verify(const uint8_t* msg, size_t len, const uint8_t sig64[64],
                 const uint8_t pub32[32]);
int ecdsa_pub_from_priv(const uint8_t priv64[64], uint8_t pub32[32]);
}  // namespace zklaim_native
