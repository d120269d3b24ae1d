// Discrete Gaussian over Z, CDF-table based, matching the reference
// (lib/spiral-rs/src/discrete_gaussian.rs: width 6.4, support [-26, 26],
// inverse-CDF from u64 draws) and sdk_tpu/discrete_gaussian.py. The table
// build replicates the Python float path op-for-op (same libm exp, same
// summation order, round-half-even) so all three clients sample identically
// from a given stream.
#pragma once

#include <cfenv>
#include <cmath>
#include <cstdint>
#include <vector>

#include "chacha20.hpp"
#include "params.hpp"

namespace spiral {

constexpr int kNumWidths = 4;

class DiscreteGaussian {
 public:
  explicit DiscreteGaussian(double noise_width) {
    max_val_ = static_cast<int>(std::ceil(noise_width * kNumWidths));
    std::vector<double> probs;
    double total = 0.0;
    for (int i = -max_val_; i <= max_val_; i++) {
      double p = std::exp(-M_PI * static_cast<double>(i) *
                          static_cast<double>(i) / (noise_width * noise_width));
      probs.push_back(p);
      total += p;
    }
    double cum = 0.0;
    const double kU64MaxF = 18446744073709551615.0;  // rounds to 2^64
    for (double p : probs) {
      cum += p / total;
      // round-half-even, like Python round() (discrete_gaussian.py:29), then
      // min(v, u64::MAX) — v can only reach 2^64, the double rounding of the
      // mask constant
      double v = std::nearbyint(cum * kU64MaxF);
      cdf_table_.push_back(v >= kU64MaxF ? ~0ULL : static_cast<u64>(v));
    }
  }

  // One u64 draw per sample; CONSTANT-TIME selection: full-table branch-free
  // comparison accumulation, like the reference's subtle-based scan
  // (discrete_gaussian.rs:78-139). The count of entries < draw IS the first
  // index with cdf[idx] >= draw.
  u64 sample(u64 modulus, ChaCha20Rng& rng) const {
    u64 draw = rng.next_u64();
    int64_t idx = 0;
    for (u64 e : cdf_table_) idx += static_cast<int64_t>(e < draw);
    int64_t val = idx - max_val_;
    // branch-free select of the mod lift
    u64 lifted = static_cast<u64>(val) + modulus;
    u64 mask = static_cast<u64>(-(static_cast<int64_t>(val < 0)));
    return (mask & lifted) | (~mask & static_cast<u64>(val));
  }

  int max_val() const { return max_val_; }
  const std::vector<u64>& cdf_table() const { return cdf_table_; }

 private:
  int max_val_;
  std::vector<u64> cdf_table_;
};

}  // namespace spiral
