// Native Spiral client: secret keys, public parameters, query generation,
// response decoding, and seed-compressed serialization — the third client
// stack next to Python (sdk_tpu/client.py) and TypeScript (js/src/crypto),
// mirroring the reference's Rust client (lib/spiral-rs/src/client.rs and
// lib/blyss-rs). Wire bytes are identical to both: every serialized matrix
// omits its pseudorandom first row, which is regenerated from a 32-byte
// ChaCha20 seed as Q - (u64 % Q) (client.rs:47-49, 68-93); the RNG draw
// order mirrors the deserializers so seeds reproduce the same rows.
#pragma once

#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

#include "bitpack.hpp"
#include "chacha20.hpp"
#include "gaussian.hpp"
#include "params.hpp"
#include "poly.hpp"

namespace spiral {

// Q - (u64 % Q) per draw (client.rs:47-49); 0 maps to Q, as in the reference.
inline void fill_inv_from_rng(const Params& p, ChaCha20Rng& rng, u64* out,
                              size_t count) {
  u64 q = p.modulus_u64();
  for (size_t i = 0; i < count; i++) out[i] = q - rng.next_u64() % q;
}

// Raw matrix rows 1.. as LE u64 (client.py:34-36)
inline void serialize_excl_first_row(const PolyMatrixRaw& a,
                                     std::vector<uint8_t>& out) {
  size_t row_words = static_cast<size_t>(a.cols) * a.poly_len;
  const u64* src = a.data.data() + row_words;  // skip row 0
  size_t nwords = static_cast<size_t>(a.rows - 1) * row_words;
  size_t base = out.size();
  out.resize(base + nwords * 8);
  for (size_t i = 0; i < nwords; i++)
    for (int b = 0; b < 8; b++)
      out[base + i * 8 + b] = static_cast<uint8_t>(src[i] >> (8 * b));
}

// NTT-domain (2,1) Regev cts -> packed u64 buffer [z][j][r], channel-0
// residue low 32 bits / channel-1 high 32 (util.rs:323-355; client.py:52-63)
inline std::vector<u64> reorient_reg_ciphertexts(
    const Params& p, const std::vector<PolyMatrixNtt>& v_reg) {
  size_t num = v_reg.size();
  std::vector<u64> out(static_cast<size_t>(p.poly_len) * num * 2);
  u64 q0 = p.moduli[0], q1 = p.moduli[1];
  for (size_t j = 0; j < num; j++) {
    const PolyMatrixNtt& ct = v_reg[j];
    for (int s = 0; s < 2; s++) {
      const u64* c0 = ct.chan(s, 0, 0);
      const u64* c1 = ct.chan(s, 0, 1);
      for (int z = 0; z < p.poly_len; z++)
        out[(static_cast<size_t>(z) * num + j) * 2 + s] =
            (c0[z] % q0) | ((c1[z] % q1) << 32);
    }
  }
  return out;
}

struct PublicParameters {
  std::vector<PolyMatrixNtt> v_packing;           // (n+1, t_conv)
  std::vector<PolyMatrixNtt> v_expansion_left;    // (2, t_exp_left)
  std::vector<PolyMatrixNtt> v_expansion_right;   // (2, t_exp_right)
  std::vector<PolyMatrixNtt> v_conversion;        // (2, 2*t_conv)
  bool has_right = false, has_conversion = false;
  uint8_t seed[kSeedLength] = {0};

  std::vector<uint8_t> serialize(const Params& p) const {  // client.py:74-86
    std::vector<uint8_t> data(seed, seed + kSeedLength);
    auto emit = [&](const std::vector<PolyMatrixNtt>& grp) {
      for (const auto& m : grp) serialize_excl_first_row(from_ntt(p, m), data);
    };
    emit(v_packing);
    emit(v_expansion_left);
    if (has_right) emit(v_expansion_right);
    if (has_conversion) emit(v_conversion);
    return data;
  }
};

struct Query {
  bool has_ct = false;
  PolyMatrixRaw ct;                   // raw (2, 1)
  std::vector<u64> v_buf;             // packed reoriented buffer
  std::vector<PolyMatrixRaw> v_ct;    // raw (2, 2*t_gsw) per further dim
  uint8_t seed[kSeedLength] = {0};

  std::vector<uint8_t> serialize(const Params& p) const {  // client.py:127-138
    std::vector<uint8_t> data(seed, seed + kSeedLength);
    if (has_ct) serialize_excl_first_row(ct, data);
    if (!v_buf.empty()) {
      size_t base = data.size();
      size_t nw = v_buf.size() / 2;
      data.resize(base + nw * 8);
      for (size_t i = 0; i < nw; i++) {
        u64 w = v_buf[2 * i + 1];  // odd words only; even halves are seed-derived
        for (int b = 0; b < 8; b++)
          data[base + i * 8 + b] = static_cast<uint8_t>(w >> (8 * b));
      }
    }
    for (const auto& m : v_ct) serialize_excl_first_row(m, data);
    return data;
  }
};

class Client {
 public:
  explicit Client(const Params& params)
      : p_(params),
        sk_gsw_(PolyMatrixRaw::zero(params, params.n, 1)),
        sk_reg_(PolyMatrixRaw::zero(params, 1, 1)),
        dg_(params.noise_width) {}

  // --- secret keys (client.py:207-231; ternary with HAMMING_WEIGHT ones and
  // minus-ones, Fisher-Yates over batched u64 draws — our own derivation,
  // secret seeds are not portable across implementations; wire formats are)
  void generate_secret_keys_from_seed(const uint8_t seed[kSeedLength]) {
    ChaCha20Rng rng(seed);
    gen_ternary_mat(sk_gsw_, kHammingWeight, rng);
    gen_ternary_mat(sk_reg_, kHammingWeight, rng);
  }

  // --- public parameters (client.rs:540-616; client.py:286-339) ---
  PublicParameters generate_keys_from_seed(const uint8_t sk_seed[kSeedLength],
                                           const uint8_t noise_seed[kSeedLength],
                                           const uint8_t pp_seed[kSeedLength]) {
    generate_secret_keys_from_seed(sk_seed);
    ChaCha20Rng rng(noise_seed);
    ChaCha20Rng rng_pub(pp_seed);
    PublicParameters pp;
    std::memcpy(pp.seed, pp_seed, kSeedLength);

    PolyMatrixNtt sk_reg_ntt = to_ntt(p_, sk_reg_);
    PolyMatrixNtt sk_gsw_ntt = to_ntt(p_, sk_gsw_);

    PolyMatrixNtt gadget_conv_ntt = to_ntt(p_, build_gadget(p_, 1, p_.t_conv));
    int num_packing_mats = p_.version == 0 ? p_.n : 1;
    for (int i = 0; i < num_packing_mats; i++) {
      PolyMatrixNtt scaled = scalar_multiply(p_, sk_reg_ntt, gadget_conv_ntt);
      PolyMatrixNtt ag = PolyMatrixNtt::zero(p_, p_.n, p_.t_conv);
      set_rows(ag, i, scaled);
      pp.v_packing.push_back(encrypt_matrix_gsw(ag, rng, rng_pub));
    }
    if (p_.version > 0) {
      PolyMatrixNtt scaled = multiply(p_, sk_gsw_ntt, gadget_conv_ntt);
      pp.v_packing.push_back(
          encrypt_matrix_gsw(shift_rows_by_one(scaled), rng, rng_pub));
    }

    if (p_.expand_queries) {
      pp.v_expansion_left =
          generate_expansion_params(p_.g(), p_.t_exp_left, rng, rng_pub);
      if (p_.version == 0 || p_.t_exp_right != p_.t_exp_left) {
        pp.v_expansion_right = generate_expansion_params(
            p_.stop_round() + 1, p_.t_exp_right, rng, rng_pub);
        pp.has_right = true;
      }
      // conversion matrix (client.py:322-338)
      PolyMatrixRaw g_conv = build_gadget(p_, 2, 2 * p_.t_conv);
      PolyMatrixNtt sk_reg_sq_ntt = multiply(p_, sk_reg_ntt, sk_reg_ntt);
      PolyMatrixNtt conv = PolyMatrixNtt::zero(p_, 2, 2 * p_.t_conv);
      for (int i = 0; i < 2 * p_.t_conv; i++) {
        u64 val = g_conv.poly(i % 2 == 0 ? 0 : 1, i)[0];
        PolyMatrixRaw single = PolyMatrixRaw::zero(p_, 1, 1);
        single.poly(0, 0)[0] = val;
        PolyMatrixNtt sigma = scalar_multiply(
            p_, to_ntt(p_, single), i % 2 == 0 ? sk_reg_sq_ntt : sk_reg_ntt);
        PolyMatrixNtt ct = encrypt_matrix_reg(sigma, rng, rng_pub);
        set_col(conv, i, ct);
      }
      pp.v_conversion.push_back(conv);
      pp.has_conversion = true;
    }
    return pp;
  }

  // --- query (client.rs:618-721; client.py:357-418) ---
  Query generate_query(u64 idx_target, const uint8_t noise_seed[kSeedLength],
                       const uint8_t query_seed[kSeedLength]) {
    int further_dims = p_.db_dim_2;
    u64 idx_dim0 = idx_target >> further_dims;
    u64 idx_further = idx_target & ((1ULL << further_dims) - 1);
    u64 q = p_.modulus_u64();
    u64 scale_k = q / p_.pt_modulus;
    int bits_per = get_bits_per(p_, p_.t_gsw);

    ChaCha20Rng rng(noise_seed);
    Query query;
    std::memcpy(query.seed, query_seed, kSeedLength);
    ChaCha20Rng rng_pub(query_seed);

    if (p_.expand_queries) {
      PolyMatrixRaw sigma = PolyMatrixRaw::zero(p_, 1, 1);
      u64* s = sigma.poly(0, 0);
      u64 inv_2_g_first = invert_uint_mod(1ULL << p_.g(), q);
      u64 inv_2_g_rest = invert_uint_mod(1ULL << (p_.stop_round() + 1), q);
      if (p_.db_dim_2 == 0) {
        s[idx_dim0] = scale_k;
        for (int i = 0; i < p_.poly_len; i++)
          s[i] = multiply_uint_mod(s[i], inv_2_g_first, q);
      } else {
        s[2 * idx_dim0] = scale_k;
        for (int i = 0; i < further_dims; i++)
          if ((idx_further >> i) & 1)
            for (int j = 0; j < p_.t_gsw; j++) {
              int idx = i * p_.t_gsw + j;
              s[2 * idx + 1] = 1ULL << (bits_per * j);
            }
        for (int i = 0; i < p_.poly_len / 2; i++) {
          s[2 * i] = multiply_uint_mod(s[2 * i], inv_2_g_first, q);
          s[2 * i + 1] = multiply_uint_mod(s[2 * i + 1], inv_2_g_rest, q);
        }
      }
      PolyMatrixNtt ct_ntt = encrypt_matrix_reg(to_ntt(p_, sigma), rng, rng_pub);
      query.ct = from_ntt(p_, ct_ntt);
      query.has_ct = true;
    } else {
      int num_expanded = 1 << p_.db_dim_1;
      std::vector<PolyMatrixNtt> reg_cts;
      for (int i = 0; i < num_expanded; i++) {
        PolyMatrixRaw sigma = PolyMatrixRaw::zero(p_, 1, 1);
        sigma.poly(0, 0)[0] = (static_cast<u64>(i) == idx_dim0) ? scale_k : 0;
        reg_cts.push_back(encrypt_matrix_reg(to_ntt(p_, sigma), rng, rng_pub));
      }
      query.v_buf = reorient_reg_ciphertexts(p_, reg_cts);
      PolyMatrixNtt sk_reg_ntt = to_ntt(p_, sk_reg_);
      for (int i = 0; i < further_dims; i++) {
        int bit = static_cast<int>((idx_further >> i) & 1);
        PolyMatrixNtt ct_gsw_ntt = PolyMatrixNtt::zero(p_, 2, 2 * p_.t_gsw);
        for (int j = 0; j < p_.t_gsw; j++) {
          PolyMatrixRaw single = PolyMatrixRaw::zero(p_, 1, 1);
          single.poly(0, 0)[0] = (1ULL << (bits_per * j)) * bit;
          PolyMatrixNtt sigma_ntt = to_ntt(p_, single);
          PolyMatrixNtt prod = multiply(p_, sk_reg_ntt, sigma_ntt);
          set_col(ct_gsw_ntt, 2 * j, encrypt_matrix_reg(prod, rng, rng_pub));
          set_col(ct_gsw_ntt, 2 * j + 1,
                  encrypt_matrix_reg(sigma_ntt, rng, rng_pub));
        }
        query.v_ct.push_back(from_ntt(p_, ct_gsw_ntt));
      }
    }
    return query;
  }

  // --- decode (client.rs:732-810; client.py:422-472) ---
  std::vector<uint8_t> decode_response(const uint8_t* data, size_t len) const {
    const Params& p = p_;
    u64 pt = p.pt_modulus;
    int p_bits = log2_ceil(pt);
    u64 q1 = 4 * pt;
    int q1_bits = log2_ceil(q1);
    u64 q2 = q2_value(p.q2_bits);
    int q2_bits = p.q2_bits;

    Params q2_params = p.clone_with_moduli({q2});

    // recenter sk_gsw into mod q2 and NTT it there
    PolyMatrixRaw sk_gsw_q2 = PolyMatrixRaw::zero(q2_params, p.n, 1);
    for (size_t i = 0; i < sk_gsw_.data.size(); i++)
      sk_gsw_q2.data[i] = recenter(sk_gsw_.data[i], p.modulus_u64(), q2);
    PolyMatrixNtt sk_gsw_q2_ntt = to_ntt(q2_params, sk_gsw_q2);

    int npoly = p.poly_len;
    PolyMatrixRaw result = PolyMatrixRaw::zero(p, p.instances * p.n, p.n);
    size_t bit_offs = 0;
    for (int instance = 0; instance < p.instances; instance++) {
      PolyMatrixRaw first_row = PolyMatrixRaw::zero(q2_params, 1, p.n);
      for (size_t i = 0; i < first_row.data.size(); i++) {
        first_row.data[i] = read_field(data, len, bit_offs, q2_bits);
        bit_offs += q2_bits;
      }
      PolyMatrixRaw rest_rows = PolyMatrixRaw::zero(p, p.n, p.n);
      for (size_t i = 0; i < rest_rows.data.size(); i++) {
        rest_rows.data[i] = read_field(data, len, bit_offs, q1_bits);
        bit_offs += q1_bits;
      }

      PolyMatrixNtt first_row_q2 = to_ntt(q2_params, first_row);
      PolyMatrixRaw sk_prod = from_ntt(
          q2_params, multiply(q2_params, sk_gsw_q2_ntt, first_row_q2));

      // rationally round [vf*q1 + vr*q2] / (q2 * q1/p) mod p (client.py:459-470)
      i128 denom = static_cast<i128>(q2) * (q1 / pt);
      for (int r = 0; r < p.n; r++)
        for (int c = 0; c < p.n; c++) {
          const u64* vf_p = sk_prod.poly(r, c);
          const u64* vr_p = rest_rows.poly(r, c);
          u64* dst = result.poly(instance * p.n + r, c);
          for (int z = 0; z < npoly; z++) {
            int64_t vf = static_cast<int64_t>(vf_p[z]);
            if (vf >= static_cast<int64_t>(q2 / 2)) vf -= static_cast<int64_t>(q2);
            int64_t vr = static_cast<int64_t>(vr_p[z]);
            if (vr >= static_cast<int64_t>(q1 / 2)) vr -= static_cast<int64_t>(q1);
            i128 rr = static_cast<i128>(vf) * static_cast<i128>(q1) +
                      static_cast<i128>(vr) * static_cast<i128>(q2);
            i128 sign = rr >= 0 ? 1 : -1;
            i128 shifted = rr + sign * (denom / 2);
            i128 res = (shifted >= 0 ? 1 : -1) *
                       ((shifted >= 0 ? shifted : -shifted) / denom);
            res = (res + (denom / static_cast<i128>(pt)) * pt + 2 * pt) %
                  static_cast<i128>(pt);
            dst[z] = static_cast<u64>(res);
          }
        }
    }
    return raw_to_bytes(p, result, p_bits, p.modp_words_per_chunk());
  }

  const PolyMatrixRaw& sk_gsw() const { return sk_gsw_; }
  const PolyMatrixRaw& sk_reg() const { return sk_reg_; }
  const Params& params() const { return p_; }

 private:
  void gen_ternary_mat(PolyMatrixRaw& mat, int hamming, ChaCha20Rng& rng) {
    u64 q = p_.modulus_u64();
    int n = p_.poly_len;
    std::vector<u64> draws(n - 1);
    for (int r = 0; r < mat.rows; r++)
      for (int c = 0; c < mat.cols; c++) {
        u64* pol = mat.poly(r, c);
        for (int i = 0; i < n; i++)
          pol[i] = i < hamming ? 1 : (i < 2 * hamming ? q - 1 : 0);
        rng.next_u64_many(draws.data(), n - 1);  // batched, like the Python
        for (int i = n - 1; i >= 1; i--) {
          u64 j = draws[n - 1 - i] % static_cast<u64>(i + 1);
          std::swap(pol[i], pol[j]);
        }
      }
  }

  // noise matrix: one u64 draw per coefficient (discrete_gaussian.py:33-55)
  PolyMatrixRaw noise(int rows, int cols, ChaCha20Rng& rng) const {
    PolyMatrixRaw out = PolyMatrixRaw::zero(p_, rows, cols);
    u64 q = p_.modulus_u64();
    for (u64& v : out.data) v = dg_.sample(q, rng);
    return out;
  }

  // (n+1, m) raw: row0 = -a, rows 1.. = e + sk_gsw * a (client.rs:401-417)
  PolyMatrixRaw get_fresh_gsw_public_key(int m, ChaCha20Rng& rng,
                                         ChaCha20Rng& rng_pub) {
    PolyMatrixRaw a = random_raw_from_rng(p_, 1, m, rng_pub);
    PolyMatrixRaw e = noise(p_.n, m, rng);
    PolyMatrixNtt b = multiply(p_, to_ntt(p_, sk_gsw_), to_ntt(p_, a));
    b = add(p_, to_ntt(p_, e), b);
    return stack(invert_raw(p_, a), from_ntt(p_, b));
  }

  // (2, 1) NTT Regev encryption of zero (client.rs:419-433)
  PolyMatrixNtt get_regev_sample(ChaCha20Rng& rng, ChaCha20Rng& rng_pub) {
    PolyMatrixRaw a = random_raw_from_rng(p_, 1, 1, rng_pub);
    PolyMatrixRaw e = noise(1, 1, rng);
    PolyMatrixNtt b = multiply(p_, to_ntt(p_, sk_reg_), to_ntt(p_, a));
    b = add(p_, to_ntt(p_, e), b);
    return stack_ntt(to_ntt(p_, invert_raw(p_, a)), b);
  }

  PolyMatrixNtt get_fresh_reg_public_key(int m, ChaCha20Rng& rng,
                                         ChaCha20Rng& rng_pub) {
    PolyMatrixNtt out = PolyMatrixNtt::zero(p_, 2, m);
    for (int c = 0; c < m; c++) set_col(out, c, get_regev_sample(rng, rng_pub));
    return out;
  }

  PolyMatrixNtt encrypt_matrix_gsw(const PolyMatrixNtt& ag_ntt, ChaCha20Rng& rng,
                                   ChaCha20Rng& rng_pub) {
    PolyMatrixRaw pk = get_fresh_gsw_public_key(ag_ntt.cols, rng, rng_pub);
    return add(p_, to_ntt(p_, pk), pad_top(p_, ag_ntt, 1));
  }

  PolyMatrixNtt encrypt_matrix_reg(const PolyMatrixNtt& a_ntt, ChaCha20Rng& rng,
                                   ChaCha20Rng& rng_pub) {
    PolyMatrixNtt pk = get_fresh_reg_public_key(a_ntt.cols, rng, rng_pub);
    return add(p_, pk, pad_top(p_, a_ntt, 1));
  }

  std::vector<PolyMatrixNtt> generate_expansion_params(int num_exp, int m_exp,
                                                       ChaCha20Rng& rng,
                                                       ChaCha20Rng& rng_pub) {
    PolyMatrixNtt g_exp_ntt = to_ntt(p_, build_gadget(p_, 1, m_exp));
    std::vector<PolyMatrixNtt> res;
    for (int i = 0; i < num_exp; i++) {
      u64 t = (static_cast<u64>(p_.poly_len) >> i) + 1;
      PolyMatrixRaw tau_sk_reg = automorph_raw(p_, sk_reg_, t);
      PolyMatrixNtt prod = multiply(p_, to_ntt(p_, tau_sk_reg), g_exp_ntt);
      res.push_back(encrypt_matrix_reg(prod, rng, rng_pub));
    }
    return res;
  }

  // dst rows [start, start+src.rows) = src
  static void set_rows(PolyMatrixNtt& dst, int start, const PolyMatrixNtt& src) {
    size_t row_sz = static_cast<size_t>(dst.cols) * dst.crt * dst.poly_len;
    std::copy(src.data.begin(), src.data.end(),
              dst.data.begin() + static_cast<size_t>(start) * row_sz);
  }

  // dst column c = src (src has 1 column)
  static void set_col(PolyMatrixNtt& dst, int c, const PolyMatrixNtt& src) {
    size_t chan_sz = static_cast<size_t>(dst.crt) * dst.poly_len;
    for (int r = 0; r < dst.rows; r++)
      std::copy(src.data.begin() + static_cast<size_t>(r) * chan_sz,
                src.data.begin() + static_cast<size_t>(r + 1) * chan_sz,
                dst.data.begin() +
                    (static_cast<size_t>(r) * dst.cols + c) * chan_sz);
  }

  // PolyMatrixRaw::to_vec (poly.rs:213-235; poly.py:188-206): bit-pack the
  // first num_coeffs coefficients of each poly, floor-aligning the bit
  // cursor to a byte boundary after each poly.
  static std::vector<uint8_t> raw_to_bytes(const Params& p,
                                           const PolyMatrixRaw& a,
                                           int modulus_bits, u64 num_coeffs) {
    size_t sz_bits = static_cast<size_t>(a.rows) * a.cols * num_coeffs *
                     modulus_bits;
    size_t sz_bytes = (sz_bits + 7) / 8 + 32;
    sz_bytes = (sz_bytes + 15) / 16 * 16;
    std::vector<uint8_t> data(sz_bytes, 0);
    size_t bit_offs = 0;
    for (int r = 0; r < a.rows; r++)
      for (int c = 0; c < a.cols; c++) {
        const u64* src = a.poly(r, c);
        for (u64 i = 0; i < num_coeffs; i++) {
          write_arbitrary_bits(data, src[i], bit_offs, modulus_bits);
          bit_offs += modulus_bits;
        }
        bit_offs = bit_offs / 8 * 8;
      }
    return data;
  }

  Params p_;
  PolyMatrixRaw sk_gsw_, sk_reg_;
  DiscreteGaussian dg_;
};

}  // namespace spiral
