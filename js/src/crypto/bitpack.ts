/** Bit-packed field I/O matching the reference read/write_arbitrary_bits
 * (lib/spiral-rs/src/util.rs:289-321): fields packed LSB-first into the
 * little-endian bitstream of the byte buffer. */

export function readField(data: Uint8Array, bitOffs: number, numBits: number): bigint {
  let word = 0n;
  const startByte = bitOffs >> 3;
  for (let b = 0; b < 10 && startByte + b < data.length; b++) {
    word |= BigInt(data[startByte + b]) << BigInt(8 * b);
  }
  return (word >> BigInt(bitOffs % 8)) & ((1n << BigInt(numBits)) - 1n);
}

/** Read `count` consecutive `numBits`-wide fields. */
export function readFields(
  data: Uint8Array,
  bitOffs: number,
  numBits: number,
  count: number
): BigUint64Array {
  const out = new BigUint64Array(count);
  for (let i = 0; i < count; i++) {
    out[i] = readField(data, bitOffs + i * numBits, numBits);
  }
  return out;
}

export function writeField(
  data: Uint8Array,
  val: bigint,
  bitOffs: number,
  numBits: number
): void {
  for (let i = 0; i < numBits; i++) {
    const bit = Number((val >> BigInt(i)) & 1n);
    const abs = bitOffs + i;
    const mask = 1 << (abs % 8);
    if (bit) data[abs >> 3] |= mask;
    else data[abs >> 3] &= ~mask;
  }
}

export function writeFields(
  data: Uint8Array,
  vals: BigUint64Array | bigint[],
  bitOffs: number,
  numBits: number
): number {
  let offs = bitOffs;
  for (const v of vals) {
    writeField(data, v, offs, numBits);
    offs += numBits;
  }
  return offs;
}
