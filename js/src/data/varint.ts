/** Varint codec (reference js/data/varint.ts, key_value.rs:7-23). */

export function varintEncode(value: number): Uint8Array {
  const out: number[] = [];
  let v = value;
  for (;;) {
    const b = v & 0x7f;
    v = Math.floor(v / 128);
    if (v) out.push(b | 0x80);
    else {
      out.push(b);
      return Uint8Array.from(out);
    }
  }
}

/** Returns [value, bytesConsumed]. */
export function varintDecode(data: Uint8Array, offset = 0): [number, number] {
  let shift = 0;
  let result = 0;
  let j = 0;
  while (shift < 63) {
    const i = data[offset + j];
    j += 1;
    result += (i & 0x7f) * 2 ** shift;
    shift += 7;
    if ((i & 0x80) === 0) break;
  }
  return [result, j];
}
