/** SHA-1 k-hash bloom filter, byte-compatible with the reference
 * (js/data/bloom.ts, python/blyss/bloom.py). Header: u32-LE k, u32-LE bits. */

import { sha1, utf8Bytes } from "../crypto/hash";
import { concatBytes } from "./serializer";

export function checkBit(data: Uint8Array, i: number): boolean {
  return (data[i >> 3] & (1 << (7 - (i % 8)))) !== 0;
}

export function setBit(data: Uint8Array, i: number): void {
  data[i >> 3] |= 1 << (7 - (i % 8));
}

export function topBeBits(data: Uint8Array, bits: number): number {
  let num = 0;
  for (let i = 0; i < bits; i++) {
    if (data[i >> 3] & (1 << (7 - (i % 8)))) num += 2 ** (bits - 1 - i);
  }
  return num;
}

export function bloomHash(key: string, hashIdx: number, bits: number): number {
  const prefix = new Uint8Array(4);
  new DataView(prefix.buffer).setUint32(0, hashIdx, true);
  const h = sha1(concatBytes([prefix, utf8Bytes(key)]));
  return topBeBits(h, bits);
}

export class BloomFilter {
  constructor(
    public k: number,
    public bits: number,
    public data: Uint8Array
  ) {}

  static fromBytes(raw: Uint8Array): BloomFilter {
    const dv = new DataView(raw.buffer, raw.byteOffset, raw.byteLength);
    return new BloomFilter(dv.getUint32(0, true), dv.getUint32(4, true), raw.subarray(8));
  }

  static empty(k: number, bits: number): BloomFilter {
    return new BloomFilter(k, bits, new Uint8Array(2 ** bits / 8));
  }

  toBytes(): Uint8Array {
    const header = new Uint8Array(8);
    const dv = new DataView(header.buffer);
    dv.setUint32(0, this.k, true);
    dv.setUint32(4, this.bits, true);
    return concatBytes([header, this.data]);
  }

  insert(key: string): void {
    for (let i = 0; i < this.k; i++) setBit(this.data, bloomHash(key, i, this.bits));
  }

  lookup(key: string): boolean {
    for (let i = 0; i < this.k; i++) {
      if (!checkBit(this.data, bloomHash(key, i, this.bits))) return false;
    }
    return true;
  }

  indices(key: string): number[] {
    const out: number[] = [];
    for (let i = 0; i < this.k; i++) out.push(bloomHash(key, i, this.bits));
    return out;
  }
}
