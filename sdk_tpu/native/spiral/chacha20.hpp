// ChaCha20 keystream RNG, stream-compatible with Rust's rand_chacha::ChaCha20Rng
// (the djb variant: 64-bit block counter in state words 12..13, stream id 0 in
// 14..15). The Spiral wire formats regenerate every matrix's pseudorandom
// first row from a 32-byte seed (reference lib/spiral-rs/src/client.rs:55-127),
// so byte compatibility requires this exact u64 stream; mirrors
// sdk_tpu/rng.py, which is fixture-pinned against the reference streams.
#pragma once

#include <cstdint>
#include <cstring>
#include <vector>

namespace spiral {

class ChaCha20Rng {
 public:
  explicit ChaCha20Rng(const uint8_t seed[32]) : counter_(0), buf_pos_(16) {
    for (int i = 0; i < 8; i++) {
      key_[i] = static_cast<uint32_t>(seed[4 * i]) |
                (static_cast<uint32_t>(seed[4 * i + 1]) << 8) |
                (static_cast<uint32_t>(seed[4 * i + 2]) << 16) |
                (static_cast<uint32_t>(seed[4 * i + 3]) << 24);
    }
  }

  // One u64 = two consecutive LE u32 keystream words, lo first (rng.py:125-128).
  uint64_t next_u64() {
    uint32_t lo = next_u32();
    uint32_t hi = next_u32();
    return static_cast<uint64_t>(lo) | (static_cast<uint64_t>(hi) << 32);
  }

  void next_u64_many(uint64_t* out, size_t n) {
    for (size_t i = 0; i < n; i++) out[i] = next_u64();
  }

  uint32_t next_u32() {
    if (buf_pos_ >= 16) {
      block(buf_, counter_++);
      buf_pos_ = 0;
    }
    return buf_[buf_pos_++];
  }

 private:
  static inline uint32_t rotl(uint32_t x, int n) {
    return (x << n) | (x >> (32 - n));
  }

  static inline void quarter(uint32_t s[16], int a, int b, int c, int d) {
    s[a] += s[b]; s[d] = rotl(s[d] ^ s[a], 16);
    s[c] += s[d]; s[b] = rotl(s[b] ^ s[c], 12);
    s[a] += s[b]; s[d] = rotl(s[d] ^ s[a], 8);
    s[c] += s[d]; s[b] = rotl(s[b] ^ s[c], 7);
  }

  void block(uint32_t out[16], uint64_t counter) const {
    static const uint32_t kConst[4] = {0x61707865u, 0x3320646Eu, 0x79622D32u,
                                       0x6B206574u};
    uint32_t init[16];
    for (int i = 0; i < 4; i++) init[i] = kConst[i];
    for (int i = 0; i < 8; i++) init[4 + i] = key_[i];
    init[12] = static_cast<uint32_t>(counter);
    init[13] = static_cast<uint32_t>(counter >> 32);
    init[14] = 0;
    init[15] = 0;
    uint32_t x[16];
    std::memcpy(x, init, sizeof(x));
    for (int r = 0; r < 10; r++) {
      quarter(x, 0, 4, 8, 12);
      quarter(x, 1, 5, 9, 13);
      quarter(x, 2, 6, 10, 14);
      quarter(x, 3, 7, 11, 15);
      quarter(x, 0, 5, 10, 15);
      quarter(x, 1, 6, 11, 12);
      quarter(x, 2, 7, 8, 13);
      quarter(x, 3, 4, 9, 14);
    }
    for (int i = 0; i < 16; i++) out[i] = x[i] + init[i];
  }

  uint32_t key_[8];
  uint64_t counter_;
  uint32_t buf_[16];
  int buf_pos_;
};

}  // namespace spiral
