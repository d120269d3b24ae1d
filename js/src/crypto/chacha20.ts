/** ChaCha20 keystream RNG, stream-compatible with Rust's
 * `rand_chacha::ChaCha20Rng` (and sdk_tpu/rng.py): the original (djb)
 * variant with a 64-bit block counter in state words 12..13 and zero stream
 * id. The Spiral wire formats regenerate the pseudorandom first row of every
 * serialized matrix from a 32-byte seed (reference
 * lib/spiral-rs/src/client.rs:55-127), so byte compatibility requires an
 * identical u64 stream per seed. */

const CONSTANTS = new Uint32Array([0x61707865, 0x3320646e, 0x79622d32, 0x6b206574]);

function rotl(x: number, n: number): number {
  return ((x << n) | (x >>> (32 - n))) >>> 0;
}

function quarter(s: Uint32Array, a: number, b: number, c: number, d: number): void {
  s[a] = (s[a] + s[b]) >>> 0;
  s[d] = rotl(s[d] ^ s[a], 16);
  s[c] = (s[c] + s[d]) >>> 0;
  s[b] = rotl(s[b] ^ s[c], 12);
  s[a] = (s[a] + s[b]) >>> 0;
  s[d] = rotl(s[d] ^ s[a], 8);
  s[c] = (s[c] + s[d]) >>> 0;
  s[b] = rotl(s[b] ^ s[c], 7);
}

/** One 64-byte block as 16 LE u32 words for block counter `counter`. */
export function chacha20Block(keyWords: Uint32Array, counter: bigint): Uint32Array {
  const init = new Uint32Array(16);
  init.set(CONSTANTS, 0);
  init.set(keyWords, 4);
  init[12] = Number(counter & 0xffffffffn);
  init[13] = Number((counter >> 32n) & 0xffffffffn);
  init[14] = 0;
  init[15] = 0;
  const x = init.slice();
  for (let i = 0; i < 10; i++) {
    quarter(x, 0, 4, 8, 12);
    quarter(x, 1, 5, 9, 13);
    quarter(x, 2, 6, 10, 14);
    quarter(x, 3, 7, 11, 15);
    quarter(x, 0, 5, 10, 15);
    quarter(x, 1, 6, 11, 12);
    quarter(x, 2, 7, 8, 13);
    quarter(x, 3, 4, 9, 14);
  }
  for (let i = 0; i < 16; i++) x[i] = (x[i] + init[i]) >>> 0;
  return x;
}

export class ChaCha20Rng {
  private keyWords: Uint32Array;
  private blockCounter = 0n;
  private buf: number[] = []; // leftover u32 words

  constructor(seed: Uint8Array) {
    if (seed.length !== 32) throw new Error("seed must be 32 bytes");
    this.keyWords = new Uint32Array(8);
    const dv = new DataView(seed.buffer, seed.byteOffset, 32);
    for (let i = 0; i < 8; i++) this.keyWords[i] = dv.getUint32(4 * i, true);
  }

  private refill(nwords: number): void {
    while (this.buf.length < nwords) {
      const block = chacha20Block(this.keyWords, this.blockCounter);
      this.blockCounter += 1n;
      for (let i = 0; i < 16; i++) this.buf.push(block[i]);
    }
  }

  nextU32Words(n: number): number[] {
    this.refill(n);
    return this.buf.splice(0, n);
  }

  /** Draw one u64 (two consecutive u32 words, lo first). */
  nextU64(): bigint {
    const [lo, hi] = this.nextU32Words(2);
    return BigInt(lo >>> 0) | (BigInt(hi >>> 0) << 32n);
  }

  nextU64Array(n: number): BigUint64Array {
    const words = this.nextU32Words(2 * n);
    const out = new BigUint64Array(n);
    for (let i = 0; i < n; i++) {
      out[i] = BigInt(words[2 * i] >>> 0) | (BigInt(words[2 * i + 1] >>> 0) << 32n);
    }
    return out;
  }

  fillBytes(n: number): Uint8Array {
    const nwords = Math.ceil(n / 4);
    const words = this.nextU32Words(nwords);
    const out = new Uint8Array(4 * nwords);
    const dv = new DataView(out.buffer);
    for (let i = 0; i < nwords; i++) dv.setUint32(4 * i, words[i], true);
    return out.subarray(0, n);
  }
}
