// Polynomial matrices over R_q for the native Spiral client. Mirrors the
// semantics of the reference (lib/spiral-rs/src/{poly,ntt,gadget}.rs) and
// sdk_tpu/{poly,ntt_host}.py with the same array-first layouts:
//   raw: (rows, cols, poly_len) u64, values mod Q
//   ntt: (rows, cols, crt_count, poly_len) u64, channel c mod moduli[c]
#pragma once

#include <cassert>
#include <cstdint>
#include <vector>

#include "chacha20.hpp"
#include "params.hpp"

namespace spiral {

struct PolyMatrixRaw {
  int rows = 0, cols = 0, poly_len = 0;
  std::vector<u64> data;  // rows*cols*poly_len

  static PolyMatrixRaw zero(const Params& p, int rows, int cols) {
    PolyMatrixRaw m;
    m.rows = rows; m.cols = cols; m.poly_len = p.poly_len;
    m.data.assign(static_cast<size_t>(rows) * cols * p.poly_len, 0);
    return m;
  }

  u64* poly(int r, int c) {
    return data.data() + (static_cast<size_t>(r) * cols + c) * poly_len;
  }
  const u64* poly(int r, int c) const {
    return data.data() + (static_cast<size_t>(r) * cols + c) * poly_len;
  }
};

struct PolyMatrixNtt {
  int rows = 0, cols = 0, crt = 0, poly_len = 0;
  std::vector<u64> data;  // rows*cols*crt*poly_len

  static PolyMatrixNtt zero(const Params& p, int rows, int cols) {
    PolyMatrixNtt m;
    m.rows = rows; m.cols = cols; m.crt = p.crt_count; m.poly_len = p.poly_len;
    m.data.assign(static_cast<size_t>(rows) * cols * p.crt_count * p.poly_len, 0);
    return m;
  }

  u64* chan(int r, int c, int ch) {
    return data.data() +
           ((static_cast<size_t>(r) * cols + c) * crt + ch) * poly_len;
  }
  const u64* chan(int r, int c, int ch) const {
    return data.data() +
           ((static_cast<size_t>(r) * cols + c) * crt + ch) * poly_len;
  }
};

// --- NTT (ntt_host.py:20-77; reference ntt.rs Harvey butterflies with
// Shoup-scaled twiddles, lazy reduction in [0, 4q)) ---

inline void ntt_forward_channel(u64* op, int n, const NttTables& t, u64 modulus) {
  int log_n = log2_exact(n);
  u64 two_q = 2 * modulus, q = modulus;
  for (int mm = 0; mm < log_n; mm++) {
    int m = 1 << mm;
    int half = n >> (mm + 1);
    for (int g = 0; g < m; g++) {
      u64 w = t.fwd[m + g], wp = t.fwd_prime[m + g];
      u64* xs = op + (static_cast<size_t>(g) * 2) * half;
      u64* ys = xs + half;
      for (int i = 0; i < half; i++) {
        u64 x = xs[i], y = ys[i];
        u64 curr_x = x - two_q * (x >= two_q);
        u64 q_tmp = (y * wp) >> 32;
        u64 q_new = w * y - q_tmp * q;
        xs[i] = curr_x + q_new;
        ys[i] = curr_x + (two_q - q_new);
      }
    }
  }
  for (int i = 0; i < n; i++) {
    op[i] -= two_q * (op[i] >= two_q);
    op[i] -= q * (op[i] >= q);
  }
}

inline void ntt_inverse_channel(u64* op, int n, const NttTables& t, u64 modulus) {
  int log_n = log2_exact(n);
  u64 two_q = 2 * modulus, q = modulus;
  for (int mm = log_n - 1; mm >= 0; mm--) {
    int h = 1 << mm;
    int half = n >> (mm + 1);
    for (int g = 0; g < h; g++) {
      u64 w = t.inv[h + g], wp = t.inv_prime[h + g];
      u64* xs = op + (static_cast<size_t>(g) * 2) * half;
      u64* ys = xs + half;
      for (int i = 0; i < half; i++) {
        u64 x = xs[i], y = ys[i];
        u64 t_tmp = two_q - y + x;
        u64 curr_x = x + y - two_q * ((x << 1) >= t_tmp);
        u64 h_tmp = (t_tmp * wp) >> 32;
        xs[i] = (curr_x + q * (t_tmp & 1)) >> 1;
        ys[i] = w * t_tmp - h_tmp * q;
      }
    }
  }
  for (int i = 0; i < n; i++) {
    op[i] -= two_q * (op[i] >= two_q);
    op[i] -= q * (op[i] >= q);
  }
}

// raw -> ntt: reduce per channel then forward NTT (poly.py:44-50)
inline PolyMatrixNtt to_ntt(const Params& p, const PolyMatrixRaw& raw) {
  PolyMatrixNtt out = PolyMatrixNtt::zero(p, raw.rows, raw.cols);
  for (int r = 0; r < raw.rows; r++)
    for (int c = 0; c < raw.cols; c++)
      for (int ch = 0; ch < p.crt_count; ch++) {
        const u64* src = raw.poly(r, c);
        u64* dst = out.chan(r, c, ch);
        u64 q = p.moduli[ch];
        for (int i = 0; i < p.poly_len; i++) dst[i] = src[i] % q;
        ntt_forward_channel(dst, p.poly_len, p.ntt_tables[ch], q);
      }
  return out;
}

// ntt -> raw: inverse NTT per channel then Garner CRT compose (poly.py:61-64)
inline PolyMatrixRaw from_ntt(const Params& p, const PolyMatrixNtt& ntt) {
  PolyMatrixRaw out = PolyMatrixRaw::zero(p, ntt.rows, ntt.cols);
  std::vector<u64> tmp(static_cast<size_t>(p.crt_count) * p.poly_len);
  for (int r = 0; r < ntt.rows; r++)
    for (int c = 0; c < ntt.cols; c++) {
      for (int ch = 0; ch < p.crt_count; ch++) {
        const u64* src = ntt.chan(r, c, ch);
        u64* t = tmp.data() + static_cast<size_t>(ch) * p.poly_len;
        for (int i = 0; i < p.poly_len; i++) t[i] = src[i];
        ntt_inverse_channel(t, p.poly_len, p.ntt_tables[ch], p.moduli[ch]);
      }
      u64* dst = out.poly(r, c);
      if (p.crt_count == 1) {
        for (int i = 0; i < p.poly_len; i++) dst[i] = tmp[i];
      } else {
        for (int i = 0; i < p.poly_len; i++)
          dst[i] = p.crt_compose_2(tmp[i], tmp[p.poly_len + i]);
      }
    }
  return out;
}

// NTT-domain matrix product; inner dim <= 128 keeps deferred u64 sums exact
// (products < 2^56; poly.py:67-77).
inline PolyMatrixNtt multiply(const Params& p, const PolyMatrixNtt& a,
                              const PolyMatrixNtt& b) {
  assert(a.cols == b.rows);
  assert(a.cols <= 128 && "inner dim too large for deferred u64 reduction");
  PolyMatrixNtt out = PolyMatrixNtt::zero(p, a.rows, b.cols);
  for (int i = 0; i < a.rows; i++)
    for (int j = 0; j < b.cols; j++)
      for (int ch = 0; ch < p.crt_count; ch++) {
        u64* dst = out.chan(i, j, ch);
        for (int k = 0; k < a.cols; k++) {
          const u64* av = a.chan(i, k, ch);
          const u64* bv = b.chan(k, j, ch);
          for (int t = 0; t < p.poly_len; t++) dst[t] += av[t] * bv[t];
        }
        u64 q = p.moduli[ch];
        for (int t = 0; t < p.poly_len; t++) dst[t] %= q;
      }
  return out;
}

// Pointwise product by a (1,1) NTT scalar (poly.py:80-85)
inline PolyMatrixNtt scalar_multiply(const Params& p, const PolyMatrixNtt& a,
                                     const PolyMatrixNtt& b) {
  assert(a.rows == 1 && a.cols == 1);
  PolyMatrixNtt out = PolyMatrixNtt::zero(p, b.rows, b.cols);
  for (int r = 0; r < b.rows; r++)
    for (int c = 0; c < b.cols; c++)
      for (int ch = 0; ch < p.crt_count; ch++) {
        const u64* av = a.chan(0, 0, ch);
        const u64* bv = b.chan(r, c, ch);
        u64* dst = out.chan(r, c, ch);
        u64 q = p.moduli[ch];
        for (int t = 0; t < p.poly_len; t++) dst[t] = (av[t] * bv[t]) % q;
      }
  return out;
}

inline PolyMatrixNtt add(const Params& p, const PolyMatrixNtt& a,
                         const PolyMatrixNtt& b) {
  assert(a.rows == b.rows && a.cols == b.cols);
  PolyMatrixNtt out = PolyMatrixNtt::zero(p, a.rows, a.cols);
  for (int r = 0; r < a.rows; r++)
    for (int c = 0; c < a.cols; c++)
      for (int ch = 0; ch < p.crt_count; ch++) {
        const u64* av = a.chan(r, c, ch);
        const u64* bv = b.chan(r, c, ch);
        u64* dst = out.chan(r, c, ch);
        u64 q = p.moduli[ch];
        for (int t = 0; t < p.poly_len; t++) dst[t] = (av[t] + bv[t]) % q;
      }
  return out;
}

// Negation in raw domain: Q - a (0 maps to Q, reduced downstream — matches
// reference invert_poly, poly.rs:387-391; poly.py:95-98)
inline PolyMatrixRaw invert_raw(const Params& p, const PolyMatrixRaw& a) {
  PolyMatrixRaw out = a;
  u64 q = p.modulus_u64();
  for (u64& v : out.data) v = q - v;
  return out;
}

// x -> x^t automorphism on raw polys (poly.rs:393-405; poly.py:101-110)
inline PolyMatrixRaw automorph_raw(const Params& p, const PolyMatrixRaw& a, u64 t) {
  PolyMatrixRaw out = PolyMatrixRaw::zero(p, a.rows, a.cols);
  u64 q = p.modulus_u64();
  int n = p.poly_len;
  for (int r = 0; r < a.rows; r++)
    for (int c = 0; c < a.cols; c++) {
      const u64* src = a.poly(r, c);
      u64* dst = out.poly(r, c);
      for (int i = 0; i < n; i++) {
        u64 rem = (static_cast<u64>(i) * t) % n;
        u64 num = (static_cast<u64>(i) * t) / n;
        dst[rem] = (num % 2 == 0) ? src[i] : q - src[i];
      }
    }
  return out;
}

// Vertical stack [a; b]
inline PolyMatrixRaw stack(const PolyMatrixRaw& a, const PolyMatrixRaw& b) {
  assert(a.cols == b.cols && a.poly_len == b.poly_len);
  PolyMatrixRaw out;
  out.rows = a.rows + b.rows; out.cols = a.cols; out.poly_len = a.poly_len;
  out.data = a.data;
  out.data.insert(out.data.end(), b.data.begin(), b.data.end());
  return out;
}

inline PolyMatrixNtt stack_ntt(const PolyMatrixNtt& a, const PolyMatrixNtt& b) {
  assert(a.cols == b.cols && a.poly_len == b.poly_len && a.crt == b.crt);
  PolyMatrixNtt out;
  out.rows = a.rows + b.rows; out.cols = a.cols; out.crt = a.crt;
  out.poly_len = a.poly_len;
  out.data = a.data;
  out.data.insert(out.data.end(), b.data.begin(), b.data.end());
  return out;
}

// Zero-pad pad_rows rows on top (poly.py:117-119)
inline PolyMatrixNtt pad_top(const Params& p, const PolyMatrixNtt& a, int pad_rows) {
  PolyMatrixNtt out = PolyMatrixNtt::zero(p, a.rows + pad_rows, a.cols);
  std::copy(a.data.begin(), a.data.end(),
            out.data.begin() + static_cast<size_t>(pad_rows) * a.cols * a.crt * a.poly_len);
  return out;
}

// Rotate rows down by one (poly.rs:340-349; poly.py:122-126)
inline PolyMatrixNtt shift_rows_by_one(const PolyMatrixNtt& a) {
  if (a.rows == 1) return a;
  PolyMatrixNtt out = a;
  size_t row_sz = static_cast<size_t>(a.cols) * a.crt * a.poly_len;
  std::copy(a.data.end() - row_sz, a.data.end(), out.data.begin());
  std::copy(a.data.begin(), a.data.end() - row_sz, out.data.begin() + row_sz);
  return out;
}

// --- gadget (reference gadget.rs; poly.py:131-167) ---

inline int get_bits_per(const Params& p, int dim) {
  if (dim == p.modulus_log2) return 1;
  return p.modulus_log2 / dim + 1;
}

inline PolyMatrixRaw build_gadget(const Params& p, int rows, int cols) {
  PolyMatrixRaw g = PolyMatrixRaw::zero(p, rows, cols);
  int num_elems = cols / rows;
  assert(cols % rows == 0);
  int bits_per = get_bits_per(p, num_elems);
  for (int i = 0; i < rows; i++)
    for (int j = 0; j < num_elems; j++) {
      if (bits_per * j >= 64) continue;
      g.poly(i, i + j * rows)[0] = 1ULL << (bits_per * j);
    }
  return g;
}

// --- random / serialization helpers ---

// Uniform mod-Q raw matrix drawn as u64 % Q, row-major
// (PolyMatrixRaw::random_rng, poly.rs:105-117; poly.py:176-181)
inline PolyMatrixRaw random_raw_from_rng(const Params& p, int rows, int cols,
                                         ChaCha20Rng& rng) {
  PolyMatrixRaw out = PolyMatrixRaw::zero(p, rows, cols);
  u64 q = p.modulus_u64();
  for (u64& v : out.data) v = rng.next_u64() % q;
  return out;
}

}  // namespace spiral
