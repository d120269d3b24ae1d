// Native Spiral client CLI — the third client binary next to the Python and
// TS SDKs, mirroring the reference's Rust client binary
// (lib/blyss-rs/src/bin/client.rs): it can run the full private-read flow
// against a live HTTP server (setup -> private-read -> decode) or operate on
// files for offline keygen/query/decode.
//
//   spiral_cli keygen <params.json> <sk_hex> <noise_hex> <pp_hex> <out.bin>
//   spiral_cli query  <params.json> <sk_hex> <idx> <noise_hex> <q_hex> <out.bin>
//   spiral_cli decode <params.json> <sk_hex> <response.bin> <out.bin>
//   spiral_cli read   <host:port> <params.json> <sk_hex> <idx> <out.bin>
//
// Seeds are 64-char hex (32 bytes). `read` generates fresh random seeds from
// /dev/urandom, uploads public params via POST /setup, issues the query via
// POST /private-read (uuid-prefixed, base64 in a JSON list — the same wire
// the Python/TS SDKs speak, sdk_tpu/clients/api.py:135-153), and decodes the
// response to the raw item bytes.
#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "client.hpp"

using namespace spiral;

namespace {

std::string read_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path.c_str()); std::exit(2); }
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

void write_file(const std::string& path, const uint8_t* data, size_t len) {
  std::ofstream f(path, std::ios::binary);
  f.write(reinterpret_cast<const char*>(data), static_cast<std::streamsize>(len));
}

void parse_hex_seed(const char* hex, uint8_t out[kSeedLength]) {
  if (std::strlen(hex) != 2 * kSeedLength) {
    std::fprintf(stderr, "seed must be %d hex chars\n", 2 * kSeedLength);
    std::exit(2);
  }
  auto nib = [](char c) -> int {
    if (c >= '0' && c <= '9') return c - '0';
    if (c >= 'a' && c <= 'f') return c - 'a' + 10;
    if (c >= 'A' && c <= 'F') return c - 'A' + 10;
    std::fprintf(stderr, "bad hex char %c\n", c);
    std::exit(2);
    return 0;
  };
  for (int i = 0; i < kSeedLength; i++)
    out[i] = static_cast<uint8_t>(nib(hex[2 * i]) << 4 | nib(hex[2 * i + 1]));
}

void random_seed(uint8_t out[kSeedLength]) {
  std::ifstream f("/dev/urandom", std::ios::binary);
  f.read(reinterpret_cast<char*>(out), kSeedLength);
}

// --- base64 (RFC 4648, no wrapping) ---

const char kB64[] =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";

std::string b64_encode(const uint8_t* data, size_t len) {
  std::string out;
  out.reserve((len + 2) / 3 * 4);
  for (size_t i = 0; i < len; i += 3) {
    uint32_t v = static_cast<uint32_t>(data[i]) << 16;
    if (i + 1 < len) v |= static_cast<uint32_t>(data[i + 1]) << 8;
    if (i + 2 < len) v |= data[i + 2];
    out.push_back(kB64[(v >> 18) & 63]);
    out.push_back(kB64[(v >> 12) & 63]);
    out.push_back(i + 1 < len ? kB64[(v >> 6) & 63] : '=');
    out.push_back(i + 2 < len ? kB64[v & 63] : '=');
  }
  return out;
}

std::vector<uint8_t> b64_decode(const std::string& s) {
  auto val = [](char c) -> int {
    if (c >= 'A' && c <= 'Z') return c - 'A';
    if (c >= 'a' && c <= 'z') return c - 'a' + 26;
    if (c >= '0' && c <= '9') return c - '0' + 52;
    if (c == '+') return 62;
    if (c == '/') return 63;
    return -1;
  };
  std::vector<uint8_t> out;
  uint32_t acc = 0;
  int bits = 0;
  for (char c : s) {
    int v = val(c);
    if (v < 0) continue;  // skip '=' and whitespace
    acc = acc << 6 | static_cast<uint32_t>(v);
    bits += 6;
    if (bits >= 8) {
      bits -= 8;
      out.push_back(static_cast<uint8_t>(acc >> bits));
    }
  }
  return out;
}

// --- minimal HTTP/1.1 over a blocking socket (localhost-scale payloads) ---

struct HttpResponse {
  int status = 0;
  std::string body;
};

HttpResponse http_request(const std::string& host, int port,
                          const std::string& method, const std::string& path,
                          const std::string& body) {
  struct addrinfo hints = {}, *res = nullptr;
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  char portbuf[16];
  std::snprintf(portbuf, sizeof portbuf, "%d", port);
  if (getaddrinfo(host.c_str(), portbuf, &hints, &res) != 0 || !res) {
    std::fprintf(stderr, "cannot resolve %s\n", host.c_str());
    std::exit(3);
  }
  int fd = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
  if (fd < 0 || connect(fd, res->ai_addr, res->ai_addrlen) != 0) {
    std::fprintf(stderr, "cannot connect %s:%d\n", host.c_str(), port);
    std::exit(3);
  }
  freeaddrinfo(res);

  std::ostringstream req;
  req << method << " " << path << " HTTP/1.1\r\n"
      << "Host: " << host << "\r\n"
      << "Content-Type: application/json\r\n"
      << "Content-Length: " << body.size() << "\r\n"
      << "Connection: close\r\n\r\n"
      << body;
  std::string out = req.str();
  size_t sent = 0;
  while (sent < out.size()) {
    ssize_t n = send(fd, out.data() + sent, out.size() - sent, 0);
    if (n <= 0) { std::fprintf(stderr, "send failed\n"); std::exit(3); }
    sent += static_cast<size_t>(n);
  }

  std::string resp;
  char buf[65536];
  ssize_t n;
  while ((n = recv(fd, buf, sizeof buf, 0)) > 0) resp.append(buf, static_cast<size_t>(n));
  close(fd);

  HttpResponse r;
  size_t sp = resp.find(' ');
  if (sp != std::string::npos) r.status = std::atoi(resp.c_str() + sp + 1);
  size_t hdr_end = resp.find("\r\n\r\n");
  std::string raw = hdr_end == std::string::npos ? "" : resp.substr(hdr_end + 4);
  // Handle chunked transfer-encoding (stdlib http.server may use it)
  if (resp.find("Transfer-Encoding: chunked") != std::string::npos ||
      resp.find("transfer-encoding: chunked") != std::string::npos) {
    size_t pos = 0;
    while (pos < raw.size()) {
      size_t eol = raw.find("\r\n", pos);
      if (eol == std::string::npos) break;
      size_t chunk_len = std::strtoul(raw.substr(pos, eol - pos).c_str(), nullptr, 16);
      if (chunk_len == 0) break;
      r.body.append(raw, eol + 2, chunk_len);
      pos = eol + 2 + chunk_len + 2;
    }
  } else {
    r.body = raw;
  }
  return r;
}

// Extract "key": "value" from a flat JSON object.
std::string json_find_string(const std::string& s, const std::string& key) {
  std::string pat = "\"" + key + "\"";
  size_t p = s.find(pat);
  if (p == std::string::npos) return "";
  p = s.find(':', p + pat.size());
  if (p == std::string::npos) return "";
  p = s.find('"', p);
  if (p == std::string::npos) return "";
  size_t e = s.find('"', p + 1);
  return s.substr(p + 1, e - p - 1);
}

int cmd_read(int argc, char** argv) {
  // read <host:port> <params.json> <sk_hex|-> <idx> <out.bin>
  std::string hostport = argv[0];
  size_t colon = hostport.rfind(':');
  std::string host = hostport.substr(0, colon);
  int port = std::atoi(hostport.c_str() + colon + 1);
  Params params = params_from_json(read_file(argv[1]));
  uint8_t sk_seed[kSeedLength], noise_seed[kSeedLength],
      pp_seed[kSeedLength], q_noise[kSeedLength], q_seed[kSeedLength];
  if (std::strcmp(argv[2], "-") == 0) random_seed(sk_seed);
  else parse_hex_seed(argv[2], sk_seed);
  random_seed(noise_seed);
  random_seed(pp_seed);
  random_seed(q_noise);
  random_seed(q_seed);
  uint64_t idx = std::strtoull(argv[3], nullptr, 10);

  Client client(params);
  PublicParameters pp =
      client.generate_keys_from_seed(sk_seed, noise_seed, pp_seed);
  std::vector<uint8_t> pp_bytes = pp.serialize(params);

  std::string setup_body = "\"" + b64_encode(pp_bytes.data(), pp_bytes.size()) + "\"";
  HttpResponse sr = http_request(host, port, "POST", "/setup", setup_body);
  if (sr.status != 200) {
    std::fprintf(stderr, "setup failed: %d %s\n", sr.status, sr.body.c_str());
    return 3;
  }
  std::string uuid = json_find_string(sr.body, "uuid");
  std::fprintf(stderr, "setup ok, uuid=%s\n", uuid.c_str());

  Query q = client.generate_query(idx, q_noise, q_seed);
  std::vector<uint8_t> q_bytes = q.serialize(params);
  std::vector<uint8_t> blob(uuid.begin(), uuid.end());
  blob.insert(blob.end(), q_bytes.begin(), q_bytes.end());
  std::string read_body = "[\"" + b64_encode(blob.data(), blob.size()) + "\"]";
  HttpResponse rr = http_request(host, port, "POST", "/private-read", read_body);
  if (rr.status != 200) {
    std::fprintf(stderr, "private-read failed: %d %s\n", rr.status, rr.body.c_str());
    return 3;
  }
  // body: ["<base64>"]
  size_t q0 = rr.body.find('"');
  size_t q1 = rr.body.find('"', q0 + 1);
  if (q0 == std::string::npos || q1 == std::string::npos) {
    std::fprintf(stderr, "bad private-read body\n");
    return 3;
  }
  std::vector<uint8_t> resp = b64_decode(rr.body.substr(q0 + 1, q1 - q0 - 1));
  std::vector<uint8_t> item = client.decode_response(resp.data(), resp.size());
  write_file(argv[4], item.data(), item.size());
  std::fprintf(stderr, "decoded %zu bytes -> %s\n", item.size(), argv[4]);
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr,
                 "usage: spiral_cli keygen|query|decode|read ... (see header)\n");
    return 2;
  }
  std::string cmd = argv[1];
  if (cmd == "keygen" && argc == 7) {
    Params params = params_from_json(read_file(argv[2]));
    uint8_t sk[kSeedLength], noise[kSeedLength], pp_seed[kSeedLength];
    parse_hex_seed(argv[3], sk);
    parse_hex_seed(argv[4], noise);
    parse_hex_seed(argv[5], pp_seed);
    Client client(params);
    PublicParameters pp = client.generate_keys_from_seed(sk, noise, pp_seed);
    std::vector<uint8_t> out = pp.serialize(params);
    write_file(argv[6], out.data(), out.size());
    return 0;
  }
  if (cmd == "query" && argc == 8) {
    Params params = params_from_json(read_file(argv[2]));
    uint8_t sk[kSeedLength], noise[kSeedLength], qs[kSeedLength];
    parse_hex_seed(argv[3], sk);
    uint64_t idx = std::strtoull(argv[4], nullptr, 10);
    parse_hex_seed(argv[5], noise);
    parse_hex_seed(argv[6], qs);
    Client client(params);
    client.generate_secret_keys_from_seed(sk);
    Query q = client.generate_query(idx, noise, qs);
    std::vector<uint8_t> out = q.serialize(params);
    write_file(argv[7], out.data(), out.size());
    return 0;
  }
  if (cmd == "decode" && argc == 6) {
    Params params = params_from_json(read_file(argv[2]));
    uint8_t sk[kSeedLength];
    parse_hex_seed(argv[3], sk);
    std::string resp = read_file(argv[4]);
    Client client(params);
    client.generate_secret_keys_from_seed(sk);
    std::vector<uint8_t> item = client.decode_response(
        reinterpret_cast<const uint8_t*>(resp.data()), resp.size());
    write_file(argv[5], item.data(), item.size());
    return 0;
  }
  if (cmd == "read" && argc == 7) return cmd_read(argc - 2, argv + 2);
  std::fprintf(stderr, "bad arguments for %s\n", cmd.c_str());
  return 2;
}
