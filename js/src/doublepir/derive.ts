/** AES-128-CTR derivation of the shared public matrices A1/A2 (reference
 * lib/doublepir/src/matrix/derivation.rs): keystream in 64 KiB chunks, chunk
 * i using IV = BE64(i) || 0^8. The client streams A·s and column sums
 * without ever materializing A (derivation.rs:28-60) — at the production
 * checklist shape A is ~380 MB, so streaming is mandatory.
 *
 * Uses WebCrypto AES-CTR (node >= 16 globalThis.crypto.subtle, all
 * browsers) — the same approach as the reference's
 * window.aes_derive_fast_{1,2} WebCrypto callbacks (js/lib/helper.ts:27-95). */

export const DERIVE_CHUNK_SIZE = 65536;

/** First 16 bytes of SHA256("blyss1") / SHA256("blyss2") — fixed public
 * seeds for A1/A2 (reference util/consts.rs:24-33). */
export const SEEDS_SHORT: [Uint8Array, Uint8Array] = [
  Uint8Array.from([0x9c, 0x22, 0x77, 0x85, 0x45, 0xac, 0x22, 0x97, 0x41, 0x90, 0x8e, 0x65, 0x2d, 0x33, 0x3a, 0x0f]),
  Uint8Array.from([0x5f, 0xff, 0xc4, 0x82, 0xc7, 0x2a, 0x85, 0x4a, 0x10, 0x35, 0x9e, 0x9f, 0xa2, 0xf5, 0xe0, 0x7f]),
];

function subtle(): SubtleCrypto {
  const g = globalThis as { crypto?: { subtle?: SubtleCrypto } };
  if (!g.crypto?.subtle) throw new Error("WebCrypto subtle not available");
  return g.crypto.subtle;
}

/** Stream the keystream chunk by chunk into `consume(chunkU32, chunkIndex)`.
 * Chunks are full 64 KiB except possibly the last. */
export async function deriveAesStream(
  key: Uint8Array,
  nbytes: number,
  consume: (words: Uint32Array, chunkIdx: number) => void
): Promise<void> {
  const s = subtle();
  const cryptoKey = await s.importKey("raw", key as BufferSource, { name: "AES-CTR" }, false, [
    "encrypt",
  ]);
  const zeros = new Uint8Array(DERIVE_CHUNK_SIZE);
  const nchunks = Math.ceil(nbytes / DERIVE_CHUNK_SIZE);
  for (let i = 0; i < nchunks; i++) {
    const counter = new Uint8Array(16);
    const dv = new DataView(counter.buffer);
    dv.setBigUint64(0, BigInt(i), false); // BE64 chunk index || zeros
    const want = Math.min(DERIVE_CHUNK_SIZE, nbytes - i * DERIVE_CHUNK_SIZE);
    const enc = new Uint8Array(
      await s.encrypt(
        { name: "AES-CTR", counter, length: 64 },
        cryptoKey,
        zeros.subarray(0, want) as BufferSource
      )
    );
    // keystream read as little-endian u32 (reference matrix.rs:125-135)
    const words = new Uint32Array(want >> 2);
    const edv = new DataView(enc.buffer, enc.byteOffset, enc.byteLength);
    for (let w = 0; w < words.length; w++) words[w] = edv.getUint32(4 * w, true);
    consume(words, i);
  }
}

export async function deriveAesBytes(key: Uint8Array, nbytes: number): Promise<Uint8Array> {
  const out = new Uint8Array(nbytes);
  let off = 0;
  await deriveAesStream(key, nbytes, (words) => {
    const dv = new DataView(out.buffer);
    for (let w = 0; w < words.length && off < nbytes; w++, off += 4) {
      dv.setUint32(off, words[w], true);
    }
  });
  return out;
}

/** out = A·s + addend where A = derive(key, rows, cols) row-major, without
 * materializing A (reference derivation.rs matrix_mul_derive_fn). `s` is a
 * (cols,) u32 vector; result (rows,) u32, wrapping. */
export async function deriveMatVec(
  key: Uint8Array,
  rows: number,
  cols: number,
  s: Uint32Array
): Promise<Uint32Array> {
  const out = new Uint32Array(rows);
  let flat = 0; // flat word index into A
  await deriveAesStream(key, rows * cols * 4, (words) => {
    for (let w = 0; w < words.length; w++, flat++) {
      const r = Math.floor(flat / cols);
      if (r >= rows) break;
      const c = flat % cols;
      out[r] = (out[r] + Math.imul(words[w], s[c])) >>> 0;
    }
  });
  return out;
}

/** colSums[c] = sum_r ratio * A[r][c] mod 2^logq, streamed. Matches the
 * recover() adjustment term (doublepir.rs:383-396). */
export async function deriveColSumsScaled(
  key: Uint8Array,
  rows: number,
  cols: number,
  ratio: number
): Promise<Uint32Array> {
  const out = new Uint32Array(cols);
  let flat = 0;
  await deriveAesStream(key, rows * cols * 4, (words) => {
    for (let w = 0; w < words.length; w++, flat++) {
      const c = flat % cols;
      out[c] = (out[c] + Math.imul(ratio, words[w])) >>> 0;
    }
  });
  return out;
}
