#pragma once
#include <cstddef>
#include <cstdint>

namespace zklaim_native {
void sha256_compress(uint32_t state[8], const uint8_t block[64]);
void sha256(const uint8_t* data, size_t len, uint8_t out[32]);
}  // namespace zklaim_native
