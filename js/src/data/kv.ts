/** Key -> PIR row mapping and row-payload parsing (reference
 * key_value.rs:25-66; mirrors sdk_tpu/kv/key_value.py). */

import { sha256, utf8Bytes } from "../crypto/hash";
import { varintDecode } from "./varint";

export const VARINT_MAX_BYTES = 8;

export function rowFromKey(numItems: number, key: string): number {
  const bucketsLog2 = Math.ceil(Math.log2(numItems));
  const h = sha256(utf8Bytes(key));
  let idx = 0;
  for (let i = 0; i < bucketsLog2; i++) {
    if (h[i >> 3] & (1 << (7 - (i % 8)))) idx += 2 ** (bucketsLog2 - i - 1);
  }
  return idx;
}

export function hashKey(key: string, keyHashBytes: number): Uint8Array {
  const h = sha256(utf8Bytes(key));
  return h.subarray(h.length - keyHashBytes);
}

function bytesEqual(a: Uint8Array, b: Uint8Array): boolean {
  if (a.length !== b.length) return false;
  for (let i = 0; i < a.length; i++) if (a[i] !== b[i]) return false;
  return true;
}

/** Find `key`'s value in a decoded row payload; returns null if absent. */
export function extractResult(key: string, result: Uint8Array): Uint8Array | null {
  if (result.length === 0) return null;
  const hashBytes = result[0];
  const target = hashKey(key, hashBytes);
  let i = 1;
  while (i < result.length) {
    const keyHash = result.subarray(i, i + hashBytes);
    i += hashBytes;
    const [valueLen, n] = varintDecode(result, i);
    i += n;
    const value = result.subarray(i, i + valueLen);
    i += valueLen;
    if (bytesEqual(keyHash, target)) return value.slice();
  }
  return null;
}
