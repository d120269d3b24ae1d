/** Full Spiral client pins: keygen bytes, query bytes, and response decode
 * must match the Python implementation exactly (which is byte-compatible
 * with the reference wire formats). */

import spiralFix from "./fixtures/spiral.json";

import { ChaCha20Rng } from "../src/crypto/chacha20";
import { SpiralClient } from "../src/crypto/client";
import { paramsFromJson } from "../src/crypto/params";
import { base64ToBytes, bytesToBase64 } from "../src/data/base64";
import { createHash } from "crypto";

function hexToBytes(hex: string): Uint8Array {
  const out = new Uint8Array(hex.length / 2);
  for (let i = 0; i < out.length; i++) out[i] = parseInt(hex.substr(2 * i, 2), 16);
  return out;
}

function bytesToHex(b: Uint8Array): string {
  return [...b].map((x) => x.toString(16).padStart(2, "0")).join("");
}

function sha256Hex(b: Uint8Array): string {
  return createHash("sha256").update(b).digest("hex");
}

const params = paramsFromJson(spiralFix.params_json);
const client = new SpiralClient(params);

test("public parameters serialize to the exact Python bytes", () => {
  const pp = client.generateKeysFromSeed(
    hexToBytes(spiralFix.secret_seed_hex),
    new ChaCha20Rng(hexToBytes(spiralFix.noise_seed_hex)),
    hexToBytes(spiralFix.pp_seed_hex)
  );
  const bytes = pp.serialize(params);
  expect(bytes.length).toBe(spiralFix.setup_bytes);
  expect(params.setupBytes()).toBe(spiralFix.setup_bytes);
  expect(bytesToHex(bytes.subarray(0, 64))).toBe(spiralFix.pp_head_hex);
  expect(bytesToHex(bytes.subarray(bytes.length - 64))).toBe(spiralFix.pp_tail_hex);
  expect(sha256Hex(bytes)).toBe(spiralFix.pp_sha256);
});

test("query serializes to the exact Python bytes", () => {
  // keygen must run first: the query encrypts under the same secret keys
  client.generateSecretKeysFromSeed(hexToBytes(spiralFix.secret_seed_hex));
  const q = client.generateQuery(
    spiralFix.target_idx,
    new ChaCha20Rng(hexToBytes(spiralFix.query_noise_seed_hex)),
    hexToBytes(spiralFix.query_seed_hex)
  );
  const bytes = q.serialize(params);
  expect(bytes.length).toBe(spiralFix.query_bytes);
  expect(sha256Hex(bytes)).toBe(spiralFix.query_sha256);
  expect(bytesToBase64(bytes)).toBe(spiralFix.query_b64);
});

test("response decodes to the exact Python bytes", () => {
  client.generateSecretKeysFromSeed(hexToBytes(spiralFix.secret_seed_hex));
  const decoded = client.decodeResponse(base64ToBytes(spiralFix.response_b64));
  expect(decoded.length).toBe(spiralFix.decoded_len);
  expect(sha256Hex(decoded)).toBe(spiralFix.decoded_sha256);
});
