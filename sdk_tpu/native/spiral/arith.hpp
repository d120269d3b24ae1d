// Modular arithmetic helpers for the native Spiral client; semantics match
// the reference (lib/spiral-rs/src/arith.rs) and sdk_tpu/arith.py. 128-bit
// intermediates via __uint128_t where products exceed 64 bits.
#pragma once

#include <cassert>
#include <cmath>
#include <cstdint>

namespace spiral {

using u64 = uint64_t;
using u128 = unsigned __int128;
using i128 = __int128;

inline int log2_exact(u64 a) {
  int b = 0;
  while ((1ULL << (b + 1)) <= a) b++;
  return b;
}

inline int log2_ceil(u64 a) {
  // ceil(log2(a)) via f64, as the reference does (arith.rs:13-15); exact for
  // the < 2^58 magnitudes used.
  return static_cast<int>(std::ceil(std::log2(static_cast<double>(a))));
}

inline u64 multiply_uint_mod(u64 a, u64 b, u64 modulus) {
  return static_cast<u64>((static_cast<u128>(a) * b) % modulus);
}

inline u64 exponentiate_uint_mod(u64 operand, u64 exponent, u64 modulus) {
  u64 result = 1 % modulus;
  u64 base = operand % modulus;
  while (exponent) {
    if (exponent & 1) result = multiply_uint_mod(result, base, modulus);
    base = multiply_uint_mod(base, base, modulus);
    exponent >>= 1;
  }
  return result;
}

inline u64 invert_uint_mod(u64 value, u64 modulus) {
  // Extended Euclid; moduli here are prime but keep it general.
  int64_t t = 0, new_t = 1;
  int64_t r = static_cast<int64_t>(modulus), new_r = static_cast<int64_t>(value % modulus);
  while (new_r != 0) {
    int64_t q = r / new_r;
    int64_t tmp = t - q * new_t; t = new_t; new_t = tmp;
    tmp = r - q * new_r; r = new_r; new_r = tmp;
  }
  assert(r == 1 && "value not invertible");
  if (t < 0) t += static_cast<int64_t>(modulus);
  return static_cast<u64>(t);
}

inline u64 reverse_bits(u64 x, int bit_count) {
  u64 out = 0;
  for (int i = 0; i < bit_count; i++) out |= ((x >> i) & 1) << (bit_count - 1 - i);
  return out;
}

inline u64 div2_uint_mod(u64 operand, u64 modulus) {
  // (operand / 2) mod modulus for odd modulus (arith.rs / sdk_tpu/arith.py:55-59)
  if (operand & 1) return (operand + modulus) >> 1;
  return operand >> 1;
}

inline u64 recenter(u64 val, u64 from_modulus, u64 to_modulus) {
  // Reference arith.rs:91-104; sdk_tpu/arith.py:62-69.
  assert(from_modulus >= to_modulus);
  i128 a_val = static_cast<i128>(val);
  if (val >= from_modulus / 2) a_val -= static_cast<i128>(from_modulus);
  a_val += static_cast<i128>(from_modulus / to_modulus) * to_modulus +
           2 * static_cast<i128>(to_modulus);
  return static_cast<u64>(a_val % static_cast<i128>(to_modulus));
}

}  // namespace spiral
