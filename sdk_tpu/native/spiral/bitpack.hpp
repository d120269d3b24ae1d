// Bit-packed field I/O matching the reference's read/write_arbitrary_bits
// (lib/spiral-rs/src/util.rs:289-321) and sdk_tpu/bitpack.py: fields packed
// LSB-first into the little-endian bitstream of the byte buffer.
#pragma once

#include <cstdint>
#include <vector>

#include "arith.hpp"

namespace spiral {

// Straightforward per-bit write (client-side; sizes are small)
inline void write_arbitrary_bits(std::vector<uint8_t>& data, u64 val,
                                 size_t bit_offs, int num_bits) {
  for (int i = 0; i < num_bits; i++) {
    size_t bit = bit_offs + i;
    uint8_t mask = static_cast<uint8_t>(1u << (bit % 8));
    if ((val >> i) & 1) data[bit / 8] |= mask;
    else data[bit / 8] &= static_cast<uint8_t>(~mask);
  }
}

// Read one num_bits-wide field at bit_offs (num_bits <= 56, bitpack.py:47-63)
inline u64 read_field(const uint8_t* data, size_t len, size_t bit_offs,
                      int num_bits) {
  size_t byte0 = bit_offs / 8;
  int shift = static_cast<int>(bit_offs % 8);
  u64 word = 0;
  for (int b = 0; b < 8; b++) {
    u64 byte = (byte0 + b < len) ? data[byte0 + b] : 0;
    word |= byte << (8 * b);
  }
  return (word >> shift) & ((num_bits >= 64) ? ~0ULL : ((1ULL << num_bits) - 1));
}

}  // namespace spiral
