/** Negacyclic NTT, bit-identical to the reference (lib/spiral-rs/src/ntt.rs)
 * and sdk_tpu/ntt_host.py: Harvey butterflies with Shoup-scaled twiddles and
 * lazy reduction in [0, 4q). Operates in place on BigUint64Array slices. */

import { NttTables, Params } from "./params";

export function nttForwardChannel(
  op: BigUint64Array,
  table: BigUint64Array,
  tablePrime: BigUint64Array,
  modulus: bigint
): void {
  const n = op.length;
  const logN = 31 - Math.clz32(n);
  const twoQ = 2n * modulus;
  for (let mm = 0; mm < logN; mm++) {
    const m = 1 << mm;
    const t = n >> (mm + 1);
    for (let i = 0; i < m; i++) {
      const w = table[m + i];
      const wp = tablePrime[m + i];
      const base = i * 2 * t;
      for (let j = 0; j < t; j++) {
        const x = op[base + j];
        const y = op[base + t + j];
        const currX = x >= twoQ ? x - twoQ : x;
        const qTmp = (y * wp) >> 32n;
        const qNew = w * y - qTmp * modulus;
        op[base + j] = currX + qNew;
        op[base + t + j] = currX + (twoQ - qNew);
      }
    }
  }
  for (let i = 0; i < n; i++) {
    let v = op[i];
    if (v >= twoQ) v -= twoQ;
    if (v >= modulus) v -= modulus;
    op[i] = v;
  }
}

export function nttInverseChannel(
  op: BigUint64Array,
  table: BigUint64Array,
  tablePrime: BigUint64Array,
  modulus: bigint
): void {
  const n = op.length;
  const logN = 31 - Math.clz32(n);
  const twoQ = 2n * modulus;
  for (let mm = logN - 1; mm >= 0; mm--) {
    const h = 1 << mm;
    const t = n >> (mm + 1);
    for (let i = 0; i < h; i++) {
      const w = table[h + i];
      const wp = tablePrime[h + i];
      const base = i * 2 * t;
      for (let j = 0; j < t; j++) {
        const x = op[base + j];
        const y = op[base + t + j];
        const tTmp = twoQ - y + x;
        const currX = x + y - ((x << 1n) >= tTmp ? twoQ : 0n);
        const hTmp = (tTmp * wp) >> 32n;
        op[base + j] = (currX + (tTmp & 1n ? modulus : 0n)) >> 1n;
        op[base + t + j] = w * tTmp - hTmp * modulus;
      }
    }
  }
  for (let i = 0; i < n; i++) {
    let v = op[i];
    if (v >= twoQ) v -= twoQ;
    if (v >= modulus) v -= modulus;
    op[i] = v;
  }
}

/** Forward NTT of one poly's CRT channels laid out back-to-back:
 * buf[(c * polyLen) .. ((c+1) * polyLen)] holds channel c. */
export function nttForwardPoly(params: Params, buf: BigUint64Array): void {
  const tables = params.nttTables();
  for (let c = 0; c < params.crtCount; c++) {
    const view = buf.subarray(c * params.polyLen, (c + 1) * params.polyLen);
    const t: NttTables = tables[c];
    nttForwardChannel(view, t.rootPowers, t.scaledRootPowers, params.moduli[c]);
  }
}

export function nttInversePoly(params: Params, buf: BigUint64Array): void {
  const tables = params.nttTables();
  for (let c = 0; c < params.crtCount; c++) {
    const view = buf.subarray(c * params.polyLen, (c + 1) * params.polyLen);
    const t: NttTables = tables[c];
    nttInverseChannel(view, t.invRootPowers, t.scaledInvRootPowers, params.moduli[c]);
  }
}
