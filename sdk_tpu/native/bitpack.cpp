// Fast bit-packed field codec for Spiral wire formats.
//
// Implements the reference's read/write_arbitrary_bits semantics
// (lib/spiral-rs/src/util.rs:289-321): fixed-width fields packed LSB-first
// into a little-endian bitstream. The Python wrapper (sdk_tpu.native)
// dispatches here via ctypes, falling back to the numpy implementation in
// sdk_tpu.bitpack when the shared library is absent.
//
// Build: make -C sdk_tpu/native  (produces libsdkbitpack.so)

#include <cstdint>
#include <cstring>

extern "C" {

// Read `count` consecutive `num_bits`-wide fields starting at bit_offs.
// data must have at least 8 readable bytes past the last field.
void read_fields(const uint8_t* data, uint64_t bit_offs, uint32_t num_bits,
                 uint64_t count, uint64_t* out) {
    const uint64_t mask =
        num_bits >= 64 ? ~0ull : ((1ull << num_bits) - 1ull);
    uint64_t offs = bit_offs;
    for (uint64_t i = 0; i < count; i++) {
        uint64_t word;
        std::memcpy(&word, data + (offs >> 3), 8);  // little-endian hosts
        out[i] = (word >> (offs & 7)) & mask;
        offs += num_bits;
    }
}

// Write `count` consecutive fields starting at bit_offs (read-modify-write
// on the field bits only). Requires num_bits <= 56 so that a field plus a
// 7-bit misalignment fits in one 8-byte window.
void write_fields(uint8_t* data, uint64_t bit_offs, uint32_t num_bits,
                  uint64_t count, const uint64_t* vals) {
    const uint64_t mask = (1ull << num_bits) - 1ull;
    uint64_t offs = bit_offs;
    for (uint64_t i = 0; i < count; i++) {
        const uint64_t byte = offs >> 3;
        const uint32_t sh = offs & 7;
        uint64_t word;
        std::memcpy(&word, data + byte, 8);
        word &= ~(mask << sh);
        word |= (vals[i] & mask) << sh;
        std::memcpy(data + byte, &word, 8);
        offs += num_bits;
    }
}

// Bit-pack rows*cols polys of `num_coeffs` coefficients at `num_bits` each,
// rounding the bit cursor down to a byte boundary after each poly
// (PolyMatrixRaw::to_vec, poly.rs:213-235). coeff stride is poly_len.
void poly_to_bytes(const uint64_t* coeffs, uint64_t num_polys,
                   uint64_t poly_len, uint64_t num_coeffs, uint32_t num_bits,
                   uint8_t* out) {
    uint64_t bit_offs = 0;
    for (uint64_t p = 0; p < num_polys; p++) {
        write_fields(out, bit_offs, num_bits, num_coeffs,
                     coeffs + p * poly_len);
        bit_offs += num_coeffs * num_bits;
        bit_offs &= ~7ull;  // round down to byte boundary
    }
}

// Modulus switch with rounding (reference arith.rs:429-444): recenter the
// mod-inp value, scale by out/inp rounding half away from zero (i128
// truncating division), remap to [0, out).
void rescale(const uint64_t* vals, uint64_t count, uint64_t inp_mod,
             uint64_t out_mod, uint64_t* out) {
    const __int128 half = (__int128)(inp_mod / 2);
    for (uint64_t i = 0; i < count; i++) {
        __int128 v = (__int128)(vals[i] % inp_mod);
        if (v >= half) v -= (__int128)inp_mod;
        const __int128 sign = v >= 0 ? 1 : -1;
        __int128 num = v * (__int128)out_mod + sign * half;
        __int128 quot = num / (__int128)inp_mod;  // truncates toward zero
        __int128 res =
            (quot + (__int128)((inp_mod / out_mod) * out_mod) +
             2 * (__int128)out_mod) %
            (__int128)out_mod;
        out[i] = (uint64_t)res;
    }
}

}  // extern "C"
