// C ABI for the native Spiral client (ctypes-consumable). The handle owns a
// spiral::Client; buffers are malloc'd and released via spiral_buffer_free.
// Mirrors the Python client surface (sdk_tpu/client.py generate_keys_from_seed
// / generate_query / decode_response), producing byte-identical wire outputs
// for the same seeds (reference lib/spiral-rs/src/client.rs:540-810).
#include <cstdlib>
#include <cstring>
#include <new>

#include "client.hpp"

using namespace spiral;

namespace {

struct Handle {
  Params params;
  Client client;
  explicit Handle(const Params& p) : params(p), client(p) {}
};

uint8_t* copy_out(const std::vector<uint8_t>& v, size_t* out_len) {
  uint8_t* buf = static_cast<uint8_t*>(std::malloc(v.size() ? v.size() : 1));
  if (!buf) return nullptr;
  std::memcpy(buf, v.data(), v.size());
  *out_len = v.size();
  return buf;
}

}  // namespace

extern "C" {

void* spiral_client_new(const char* params_json) {
  try {
    Params p = params_from_json(params_json);
    return new Handle(p);
  } catch (...) {
    return nullptr;
  }
}

void spiral_client_free(void* h) { delete static_cast<Handle*>(h); }

void spiral_buffer_free(uint8_t* p) { std::free(p); }

// Regenerate just the secret keys (for decode-only use; cheaper than the
// full spiral_generate_keys).
void spiral_generate_secret_keys(void* h, const uint8_t* sk_seed) {
  static_cast<Handle*>(h)->client.generate_secret_keys_from_seed(sk_seed);
}

// Serialized public parameters (seed || matrices-minus-first-rows).
uint8_t* spiral_generate_keys(void* h, const uint8_t* sk_seed,
                              const uint8_t* noise_seed, const uint8_t* pp_seed,
                              size_t* out_len) {
  try {
    Handle* hd = static_cast<Handle*>(h);
    PublicParameters pp =
        hd->client.generate_keys_from_seed(sk_seed, noise_seed, pp_seed);
    return copy_out(pp.serialize(hd->params), out_len);
  } catch (...) {
    return nullptr;
  }
}

// Serialized query for idx (secret keys must have been generated first —
// spiral_generate_keys seeds them; call it before this).
uint8_t* spiral_generate_query(void* h, uint64_t idx, const uint8_t* noise_seed,
                               const uint8_t* query_seed, size_t* out_len) {
  try {
    Handle* hd = static_cast<Handle*>(h);
    Query q = hd->client.generate_query(idx, noise_seed, query_seed);
    return copy_out(q.serialize(hd->params), out_len);
  } catch (...) {
    return nullptr;
  }
}

// Decode a server response to the raw item bytes.
uint8_t* spiral_decode_response(void* h, const uint8_t* data, size_t len,
                                size_t* out_len) {
  try {
    Handle* hd = static_cast<Handle*>(h);
    return copy_out(hd->client.decode_response(data, len), out_len);
  } catch (...) {
    return nullptr;
  }
}

uint64_t spiral_setup_bytes(void* h) {
  return static_cast<Handle*>(h)->params.setup_bytes();
}

uint64_t spiral_query_bytes(void* h) {
  return static_cast<Handle*>(h)->params.query_bytes();
}

}  // extern "C"
