/** Pure-TS bzip2 decompressor (decode only).
 *
 * The server stores each KV row bzip2-compressed before PIR encoding
 * (reference db/write.rs:176-180), so decoding a private read requires
 * bzip2. The reference JS SDK gets this from its wasm bridge (Rust bzip2
 * crate); this SDK is pure TS, so the decoder is implemented from the
 * bzip2 format spec: Huffman-coded MTF/RLE2 symbols over a BWT, then RLE1.
 * Tolerates trailing zero padding after the final stream block (rows are
 * zero-padded to the PIR slot size). */

class BitReader {
  private pos = 0; // bit position
  constructor(private data: Uint8Array) {}

  read(n: number): number {
    let out = 0;
    for (let i = 0; i < n; i++) {
      const byte = this.data[this.pos >> 3] ?? 0;
      const bit = (byte >> (7 - (this.pos & 7))) & 1;
      out = out * 2 + bit;
      this.pos++;
    }
    return out;
  }

  readBit(): number {
    return this.read(1);
  }
}

const GROUP_SIZE = 50;
const MAX_HUFCODE_BITS = 20;

interface HuffGroup {
  limit: Int32Array; // max code value per length (inclusive), scaled
  base: Int32Array;
  permute: Int32Array;
  minLen: number;
  maxLen: number;
}

function buildHuffGroup(lengths: Uint8Array, alphaSize: number): HuffGroup {
  let minLen = 32;
  let maxLen = 0;
  for (let i = 0; i < alphaSize; i++) {
    if (lengths[i] > maxLen) maxLen = lengths[i];
    if (lengths[i] < minLen) minLen = lengths[i];
  }
  const permute = new Int32Array(alphaSize);
  let pp = 0;
  for (let len = minLen; len <= maxLen; len++) {
    for (let i = 0; i < alphaSize; i++) {
      if (lengths[i] === len) permute[pp++] = i;
    }
  }
  const count = new Int32Array(MAX_HUFCODE_BITS + 2);
  for (let i = 0; i < alphaSize; i++) count[lengths[i] + 1]++;
  for (let i = 1; i < count.length; i++) count[i] += count[i - 1];
  const limit = new Int32Array(MAX_HUFCODE_BITS + 2);
  const base = new Int32Array(MAX_HUFCODE_BITS + 2);
  let vec = 0;
  for (let len = minLen; len <= maxLen; len++) {
    vec += count[len + 1] - count[len];
    limit[len] = vec - 1;
    vec <<= 1;
  }
  for (let len = minLen + 1; len <= maxLen; len++) {
    base[len] = ((limit[len - 1] + 1) << 1) - count[len];
  }
  return { limit, base, permute, minLen, maxLen };
}

function decodeSymbol(br: BitReader, g: HuffGroup): number {
  let len = g.minLen;
  let code = br.read(len);
  while (len <= g.maxLen) {
    if (code <= g.limit[len]) {
      return g.permute[code - g.base[len]];
    }
    code = code * 2 + br.readBit();
    len++;
  }
  throw new Error("bz2: bad huffman code");
}

const CRC32_TABLE = (() => {
  const table = new Uint32Array(256);
  for (let i = 0; i < 256; i++) {
    let c = i << 24;
    for (let k = 0; k < 8; k++) {
      c = c & 0x80000000 ? ((c << 1) ^ 0x04c11db7) >>> 0 : (c << 1) >>> 0;
    }
    table[i] = c >>> 0;
  }
  return table;
})();

function decodeBlock(br: BitReader, level: number, out: number[]): number {
  const storedCrc = (br.read(16) * 65536 + br.read(16)) >>> 0;
  if (br.readBit()) throw new Error("bz2: randomized blocks unsupported");
  const origPtr = br.read(24);

  // symbol map
  const used16 = br.read(16);
  const seqToUnseq: number[] = [];
  for (let i = 0; i < 16; i++) {
    if (used16 & (0x8000 >> i)) {
      const bits = br.read(16);
      for (let j = 0; j < 16; j++) {
        if (bits & (0x8000 >> j)) seqToUnseq.push(16 * i + j);
      }
    }
  }
  const nInUse = seqToUnseq.length;
  const alphaSize = nInUse + 2;

  const nGroups = br.read(3);
  const nSelectors = br.read(15);
  if (nGroups < 2 || nGroups > 6) throw new Error("bz2: bad group count");

  // selectors, MTF-coded
  const mtfGroups: number[] = [];
  for (let i = 0; i < nGroups; i++) mtfGroups.push(i);
  const selectors: number[] = [];
  for (let i = 0; i < nSelectors; i++) {
    let j = 0;
    while (br.readBit()) j++;
    if (j >= nGroups) throw new Error("bz2: bad selector");
    const v = mtfGroups.splice(j, 1)[0];
    mtfGroups.unshift(v);
    selectors.push(v);
  }

  // per-group code lengths (delta-coded)
  const groups: HuffGroup[] = [];
  for (let gi = 0; gi < nGroups; gi++) {
    const lengths = new Uint8Array(alphaSize);
    let len = br.read(5);
    for (let s = 0; s < alphaSize; s++) {
      for (;;) {
        if (len < 1 || len > MAX_HUFCODE_BITS) throw new Error("bz2: bad code length");
        if (!br.readBit()) break;
        if (br.readBit()) len--;
        else len++;
      }
      lengths[s] = len;
    }
    groups.push(buildHuffGroup(lengths, alphaSize));
  }

  // MTF + RLE2 decode
  const mtf: number[] = seqToUnseq.slice();
  const eob = alphaSize - 1;
  const bwt: number[] = [];
  const maxBlock = level * 100000;
  let groupCount = 0;
  let groupIdx = -1;
  let cur: HuffGroup | null = null;
  let runLen = 0;
  let runShift = 0;
  for (;;) {
    if (groupCount === 0) {
      groupCount = GROUP_SIZE;
      groupIdx++;
      if (groupIdx >= selectors.length) throw new Error("bz2: ran out of selectors");
      cur = groups[selectors[groupIdx]];
    }
    groupCount--;
    const sym = decodeSymbol(br, cur as HuffGroup);
    if (sym <= 1) {
      // RUNA / RUNB
      runLen += (sym + 1) << runShift;
      runShift++;
      continue;
    }
    if (runLen) {
      const b = mtf[0];
      for (let i = 0; i < runLen; i++) bwt.push(b);
      runLen = 0;
      runShift = 0;
      if (bwt.length > maxBlock) throw new Error("bz2: block overflow");
    }
    if (sym === eob) break;
    const v = mtf.splice(sym - 1, 1)[0];
    mtf.unshift(v);
    bwt.push(v);
    if (bwt.length > maxBlock) throw new Error("bz2: block overflow");
  }

  // inverse BWT
  const nblock = bwt.length;
  if (origPtr >= nblock) throw new Error("bz2: bad origPtr");
  const counts = new Int32Array(256);
  for (let i = 0; i < nblock; i++) counts[bwt[i]]++;
  const cftab = new Int32Array(257);
  for (let i = 0; i < 256; i++) cftab[i + 1] = cftab[i] + counts[i];
  const tt = new Int32Array(nblock);
  const idx = cftab.slice(0, 256);
  for (let i = 0; i < nblock; i++) {
    const b = bwt[i];
    tt[idx[b]] = i;
    idx[b]++;
  }

  // RLE1 decode while walking the BWT permutation, computing the block CRC
  let pos = tt[origPtr];
  let crc = 0xffffffff;
  let prev = -1;
  let runCount = 0;
  const emit = (b: number) => {
    out.push(b);
    crc = (((crc << 8) >>> 0) ^ CRC32_TABLE[((crc >>> 24) ^ b) & 0xff]) >>> 0;
  };
  for (let i = 0; i < nblock; i++) {
    const b = bwt[pos];
    pos = tt[pos];
    if (runCount === 4) {
      // this byte is the repeat count for the preceding run of 4
      for (let k = 0; k < b; k++) emit(prev);
      runCount = 0;
      prev = -1;
      continue;
    }
    if (b === prev) runCount++;
    else {
      prev = b;
      runCount = 1;
    }
    emit(b);
  }
  crc = ~crc >>> 0;
  if (crc !== storedCrc) throw new Error("bz2: block CRC mismatch");
  return crc;
}

/** Decompress a bzip2 stream; ignores trailing garbage after the end-of-
 * stream magic (e.g. the PIR row's zero padding). */
export function bz2Decompress(data: Uint8Array): Uint8Array {
  if (data[0] !== 0x42 || data[1] !== 0x5a || data[2] !== 0x68) {
    throw new Error("bz2: bad magic");
  }
  const level = data[3] - 0x30;
  if (level < 1 || level > 9) throw new Error("bz2: bad level");
  const br = new BitReader(data.subarray(4));
  const out: number[] = [];
  let combinedCrc = 0;
  for (;;) {
    const hi = br.read(24);
    const lo = br.read(24);
    if (hi === 0x314159 && lo === 0x265359) {
      const blockCrc = decodeBlock(br, level, out);
      combinedCrc = (((combinedCrc << 1) | (combinedCrc >>> 31)) ^ blockCrc) >>> 0;
    } else if (hi === 0x177245 && lo === 0x385090) {
      const storedCombined = (br.read(16) * 65536 + br.read(16)) >>> 0;
      if (storedCombined !== combinedCrc) throw new Error("bz2: stream CRC mismatch");
      break;
    } else {
      throw new Error("bz2: bad block magic");
    }
  }
  return Uint8Array.from(out);
}
