/** Chunk framing for multi-part payloads: u64-LE count, u64-LE lengths, then
 * concatenated chunks (reference js/data/serializer.ts,
 * lib/blyss-rs/src/api.rs:88-115). */

import { varintDecode, varintEncode } from "./varint";

export function concatBytes(parts: Uint8Array[]): Uint8Array {
  let total = 0;
  for (const p of parts) total += p.length;
  const out = new Uint8Array(total);
  let off = 0;
  for (const p of parts) {
    out.set(p, off);
    off += p.length;
  }
  return out;
}

function u64le(n: number): Uint8Array {
  const out = new Uint8Array(8);
  new DataView(out.buffer).setBigUint64(0, BigInt(n), true);
  return out;
}

export function serializeChunks(chunks: Uint8Array[]): Uint8Array {
  const parts: Uint8Array[] = [u64le(chunks.length)];
  for (const c of chunks) parts.push(u64le(c.length));
  for (const c of chunks) parts.push(c);
  return concatBytes(parts);
}

export function deserializeChunks(data: Uint8Array): Uint8Array[] {
  const dv = new DataView(data.buffer, data.byteOffset, data.byteLength);
  const count = Number(dv.getBigUint64(0, true));
  const lengths: number[] = [];
  for (let i = 0; i < count; i++) lengths.push(Number(dv.getBigUint64(8 + 8 * i, true)));
  let offs = 8 + 8 * count;
  const out: Uint8Array[] = [];
  for (const len of lengths) {
    out.push(data.subarray(offs, offs + len));
    offs += len;
  }
  return out;
}

/** Blyss "kv-item": varint key len, key, varint value len, value. */
export function wrapKeyVal(key: Uint8Array, value: Uint8Array): Uint8Array {
  return concatBytes([varintEncode(key.length), key, varintEncode(value.length), value]);
}

export function unwrapKeyVal(data: Uint8Array): [Uint8Array, Uint8Array, number] {
  const [klen, n] = varintDecode(data);
  const key = data.subarray(n, n + klen);
  const offs = n + klen;
  const [vlen, n2] = varintDecode(data, offs);
  const value = data.subarray(offs + n2, offs + n2 + vlen);
  return [key, value, offs + n2 + vlen];
}
