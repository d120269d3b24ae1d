// Spiral scheme parameters + Shoup NTT tables for the native client.
// Mirrors sdk_tpu/params.py (JSON schema identical to the reference,
// lib/spiral-rs/src/params.rs, util.rs:219-263, ntt.rs:39-65).
#pragma once

#include <cassert>
#include <cmath>
#include <cstdint>
#include <string>
#include <vector>

#include "arith.hpp"

namespace spiral {

constexpr int kSeedLength = 32;
constexpr int kHammingWeight = 256;
constexpr int kMinQ2Bits = 14;
constexpr u64 kDefaultModuli[2] = {268369921ULL, 249561089ULL};

// Reference params.rs:8-46
inline u64 q2_value(int q2_bits) {
  static const u64 kQ2[] = {
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      12289, 12289, 61441, 65537, 65537, 520193, 786433, 786433, 3604481,
      7340033, 16515073, 33292289, 67043329, 132120577, 268369921, 469762049,
      1073479681, 2013265921, 4293918721, 8588886017ULL, 17175674881ULL,
      34359214081ULL, 68718428161ULL};
  assert(q2_bits >= 0 && q2_bits < static_cast<int>(sizeof(kQ2) / sizeof(u64)));
  return kQ2[q2_bits];
}

inline bool is_primitive_root(u64 root, u64 degree, u64 modulus) {
  if (root == 0) return false;
  return exponentiate_uint_mod(root, degree >> 1, modulus) == modulus - 1;
}

// Deterministic minimal primitive degree-th root (params.py:45-69; the
// reference number_theory.rs:41-55 minimizes over the odd-power orbit of a
// random primitive root — the orbit minimum is unique, so this matches).
inline u64 get_minimal_primitive_root(u64 degree, u64 modulus) {
  u64 group = modulus - 1;
  u64 quotient = group / degree;
  assert(group % degree == 0);
  u64 root = 0;
  for (u64 cand = 2; cand < 10000; cand++) {
    u64 r = exponentiate_uint_mod(cand, quotient, modulus);
    if (is_primitive_root(r, degree, modulus)) { root = r; break; }
  }
  assert(root != 0);
  u64 gen_sq = multiply_uint_mod(root, root, modulus);
  u64 cur = root, best = root;
  for (u64 i = 0; i < degree; i++) {
    if (cur < best) best = cur;
    cur = multiply_uint_mod(cur, gen_sq, modulus);
  }
  return best;
}

struct NttTables {
  // [root_powers, scaled_root_powers, inv_root_powers, scaled_inv_root_powers]
  // indexed bit-reversed (table[m+i] drives butterfly group i of stage m).
  std::vector<u64> fwd, fwd_prime, inv, inv_prime;
};

inline NttTables build_ntt_tables_channel(int poly_len, u64 modulus) {
  int log2n = log2_exact(poly_len);
  u64 root = get_minimal_primitive_root(2ULL * poly_len, modulus);
  u64 inv_root = invert_uint_mod(root, modulus);

  auto powers_of = [&](u64 r) {
    std::vector<u64> tbl(poly_len, 0);
    u64 power = r;
    for (int i = 1; i < poly_len; i++) {
      tbl[reverse_bits(i, log2n)] = power;
      power = multiply_uint_mod(power, r, modulus);
    }
    tbl[0] = 1;
    return tbl;
  };

  NttTables out;
  out.fwd = powers_of(root);
  out.inv = powers_of(inv_root);
  for (int i = 0; i < poly_len; i++) out.inv[i] = div2_uint_mod(out.inv[i], modulus);
  auto scale_u32 = [&](const std::vector<u64>& tbl) {
    // floor(w * 2^32 / q) truncated to u32 (ntt.rs:29-37)
    std::vector<u64> s(tbl.size());
    for (size_t i = 0; i < tbl.size(); i++)
      s[i] = static_cast<u64>(((static_cast<u128>(tbl[i]) << 32) / modulus) &
                              0xFFFFFFFFu);
    return s;
  };
  out.fwd_prime = scale_u32(out.fwd);
  out.inv_prime = scale_u32(out.inv);
  return out;
}

struct Params {
  int poly_len = 2048;
  std::vector<u64> moduli{kDefaultModuli[0], kDefaultModuli[1]};
  double noise_width = 6.4;
  int n = 2;
  u64 pt_modulus = 256;
  int q2_bits = 20;
  int t_conv = 4;
  int t_exp_left = 8;
  int t_exp_right = 56;
  int t_gsw = 8;
  bool expand_queries = true;
  int db_dim_1 = 9;
  int db_dim_2 = 6;
  int instances = 1;
  u64 db_item_size = 8192;
  int version = 0;

  // derived
  int poly_len_log2 = 11;
  int crt_count = 2;
  u128 modulus = 0;
  int modulus_log2 = 0;
  u64 inv_q0_mod_q1 = 0;  // Garner constant
  std::vector<NttTables> ntt_tables;

  void finalize() {
    assert(q2_bits >= kMinQ2Bits);
    poly_len_log2 = log2_exact(poly_len);
    crt_count = static_cast<int>(moduli.size());
    modulus = 1;
    for (u64 m : moduli) modulus *= m;
    // log2_ceil over u128 (moduli products < 2^64 in every shipped config
    // except none; reference computes on f64 too)
    modulus_log2 = static_cast<int>(
        std::ceil(std::log2(static_cast<double>(modulus))));
    if (crt_count == 2) inv_q0_mod_q1 = invert_uint_mod(moduli[0], moduli[1]);
    ntt_tables.clear();
    for (u64 m : moduli)
      ntt_tables.push_back(build_ntt_tables_channel(poly_len, m));
  }

  u64 modulus_u64() const {
    assert(modulus <= ~0ULL);
    return static_cast<u64>(modulus);
  }

  int num_expanded() const { return 1 << db_dim_1; }
  u64 num_items() const { return (1ULL << db_dim_1) << db_dim_2; }
  int g() const {
    u64 num_bits_to_gen = static_cast<u64>(t_gsw) * db_dim_2 + num_expanded();
    return log2_ceil(num_bits_to_gen);
  }
  int stop_round() const {
    return log2_ceil(static_cast<u64>(t_gsw) * db_dim_2);
  }

  size_t setup_bytes() const {  // params.py:173-185
    size_t sz_polys = 0;
    int num_packing_mats = version == 0 ? n : 2;
    sz_polys += static_cast<size_t>(num_packing_mats) * n * t_conv;
    if (expand_queries) {
      size_t left = static_cast<size_t>(g()) * t_exp_left;
      size_t right = static_cast<size_t>(stop_round() + 1) * t_exp_right;
      if (version > 0 && t_exp_left == t_exp_right) right = 0;
      sz_polys += left + right + 2 * static_cast<size_t>(t_conv);
    }
    return kSeedLength + sz_polys * poly_len * 8;
  }

  size_t query_bytes() const {  // params.py:187-192
    size_t sz_polys = expand_queries
        ? 1
        : static_cast<size_t>(num_expanded()) + db_dim_2 * (2ULL * t_gsw);
    return kSeedLength + sz_polys * poly_len * 8;
  }

  size_t query_v_buf_bytes() const {
    return static_cast<size_t>(num_expanded()) * poly_len * 8;
  }

  u64 bytes_per_chunk() const {
    u64 chunks = static_cast<u64>(instances) * n * n;
    return (db_item_size + chunks - 1) / chunks;
  }

  u64 modp_words_per_chunk() const {
    int logp = log2_exact(pt_modulus);
    return (bytes_per_chunk() * 8 + logp - 1) / logp;
  }

  // Garner compose of two residues (params.py:207-211)
  u64 crt_compose_2(u64 x, u64 y) const {
    u64 q0 = moduli[0], q1 = moduli[1];
    u64 t = multiply_uint_mod((y + q1 - x % q1) % q1, inv_q0_mod_q1, q1);
    return x + q0 * t;
  }

  Params clone_with_moduli(std::vector<u64> new_moduli) const {
    Params p = *this;
    p.moduli = std::move(new_moduli);
    p.ntt_tables.clear();
    p.finalize();
    return p;
  }
};

// Minimal flat-JSON parse, schema identical to the reference
// (util.rs:224-263; params.py:247-273). Only the keys the schema defines.
inline bool json_find_u64(const std::string& s, const std::string& key, u64* out) {
  std::string pat = "\"" + key + "\"";
  size_t p = s.find(pat);
  if (p == std::string::npos) return false;
  p = s.find(':', p + pat.size());
  if (p == std::string::npos) return false;
  p++;
  while (p < s.size() && (s[p] == ' ' || s[p] == '\t' || s[p] == '\n')) p++;
  u64 v = 0;
  bool any = false;
  while (p < s.size() && s[p] >= '0' && s[p] <= '9') {
    v = v * 10 + (s[p] - '0');
    p++;
    any = true;
  }
  if (!any) return false;
  *out = v;
  return true;
}

inline Params params_from_json(const std::string& cfg) {
  Params p;
  u64 v;
  if (json_find_u64(cfg, "n", &v)) p.n = static_cast<int>(v);
  if (json_find_u64(cfg, "nu_1", &v)) p.db_dim_1 = static_cast<int>(v);
  if (json_find_u64(cfg, "nu_2", &v)) p.db_dim_2 = static_cast<int>(v);
  if (json_find_u64(cfg, "instances", &v)) p.instances = static_cast<int>(v);
  if (json_find_u64(cfg, "p", &v)) p.pt_modulus = v;
  if (json_find_u64(cfg, "q2_bits", &v))
    p.q2_bits = std::max(static_cast<int>(v), kMinQ2Bits);
  if (json_find_u64(cfg, "t_gsw", &v)) p.t_gsw = static_cast<int>(v);
  if (json_find_u64(cfg, "t_conv", &v)) p.t_conv = static_cast<int>(v);
  if (json_find_u64(cfg, "t_exp_left", &v)) p.t_exp_left = static_cast<int>(v);
  if (json_find_u64(cfg, "t_exp_right", &v)) p.t_exp_right = static_cast<int>(v);
  p.expand_queries = cfg.find("\"direct_upload\"") == std::string::npos;
  u64 item_size = 0;
  if (json_find_u64(cfg, "db_item_size", &v)) item_size = v;
  if (item_size == 0)
    item_size = static_cast<u64>(p.instances) * p.n * p.n * 2048 *
                log2_ceil(p.pt_modulus) / 8;
  p.db_item_size = item_size;
  if (json_find_u64(cfg, "version", &v)) p.version = static_cast<int>(v);
  p.finalize();
  return p;
}

}  // namespace spiral
