/** Polynomial matrices over R_q for the Spiral client (mirrors
 * sdk_tpu/poly.py / reference lib/spiral-rs/src/poly.rs + gadget.rs).
 *
 * raw (coefficient domain): data[(r*cols + c)*polyLen + z], values mod Q
 * ntt (evaluation domain):  data[((r*cols + c)*crt + ch)*polyLen + z],
 *                           channel ch holding residues mod moduli[ch]
 */

import { Params } from "./params";
import { nttForwardPoly, nttInversePoly } from "./ntt";
import { ChaCha20Rng } from "./chacha20";

export class PolyMatrixRaw {
  constructor(
    public params: Params,
    public rows: number,
    public cols: number,
    public data: BigUint64Array
  ) {}

  static zero(params: Params, rows: number, cols: number): PolyMatrixRaw {
    return new PolyMatrixRaw(params, rows, cols, new BigUint64Array(rows * cols * params.polyLen));
  }

  static identity(params: Params, rows: number, cols: number): PolyMatrixRaw {
    const out = PolyMatrixRaw.zero(params, rows, cols);
    for (let r = 0; r < rows; r++) out.data[(r * cols + r) * params.polyLen] = 1n;
    return out;
  }

  static singleValue(params: Params, value: bigint): PolyMatrixRaw {
    const out = PolyMatrixRaw.zero(params, 1, 1);
    out.data[0] = value;
    return out;
  }

  /** Uniform mod-Q raw matrix drawn as u64 % Q, row-major (poly.rs:105-117). */
  static randomFromRng(
    params: Params,
    rows: number,
    cols: number,
    rng: ChaCha20Rng
  ): PolyMatrixRaw {
    const out = PolyMatrixRaw.zero(params, rows, cols);
    const vals = rng.nextU64Array(rows * cols * params.polyLen);
    for (let i = 0; i < vals.length; i++) out.data[i] = vals[i] % params.modulus;
    return out;
  }

  poly(r: number, c: number): BigUint64Array {
    const n = this.params.polyLen;
    const off = (r * this.cols + c) * n;
    return this.data.subarray(off, off + n);
  }

  copy(): PolyMatrixRaw {
    return new PolyMatrixRaw(this.params, this.rows, this.cols, this.data.slice());
  }
}

export class PolyMatrixNtt {
  constructor(
    public params: Params,
    public rows: number,
    public cols: number,
    public data: BigUint64Array
  ) {}

  static zero(params: Params, rows: number, cols: number): PolyMatrixNtt {
    return new PolyMatrixNtt(
      params,
      rows,
      cols,
      new BigUint64Array(rows * cols * params.crtCount * params.polyLen)
    );
  }

  poly(r: number, c: number): BigUint64Array {
    const sz = this.params.crtCount * this.params.polyLen;
    const off = (r * this.cols + c) * sz;
    return this.data.subarray(off, off + sz);
  }

  copy(): PolyMatrixNtt {
    return new PolyMatrixNtt(this.params, this.rows, this.cols, this.data.slice());
  }
}

export function toNtt(params: Params, raw: PolyMatrixRaw): PolyMatrixNtt {
  const out = PolyMatrixNtt.zero(params, raw.rows, raw.cols);
  for (let r = 0; r < raw.rows; r++) {
    for (let c = 0; c < raw.cols; c++) {
      const src = raw.poly(r, c);
      const dst = out.poly(r, c);
      for (let ch = 0; ch < params.crtCount; ch++) {
        const q = params.moduli[ch];
        for (let z = 0; z < params.polyLen; z++) dst[ch * params.polyLen + z] = src[z] % q;
      }
      nttForwardPoly(params, dst);
    }
  }
  return out;
}

export function fromNtt(params: Params, ntt: PolyMatrixNtt): PolyMatrixRaw {
  const out = PolyMatrixRaw.zero(params, ntt.rows, ntt.cols);
  const n = params.polyLen;
  for (let r = 0; r < ntt.rows; r++) {
    for (let c = 0; c < ntt.cols; c++) {
      const buf = ntt.poly(r, c).slice();
      nttInversePoly(params, buf);
      const dst = out.poly(r, c);
      if (params.crtCount === 1) {
        dst.set(buf.subarray(0, n));
      } else {
        for (let z = 0; z < n; z++) dst[z] = params.crtCompose2(buf[z], buf[n + z]);
      }
    }
  }
  return out;
}

/** NTT-domain matrix product (exact; bigint keeps sums unbounded-safe). */
export function multiply(params: Params, a: PolyMatrixNtt, b: PolyMatrixNtt): PolyMatrixNtt {
  if (a.cols !== b.rows) throw new Error("shape mismatch");
  const out = PolyMatrixNtt.zero(params, a.rows, b.cols);
  const n = params.polyLen;
  for (let i = 0; i < a.rows; i++) {
    for (let j = 0; j < b.cols; j++) {
      const dst = out.poly(i, j);
      for (let k = 0; k < a.cols; k++) {
        const pa = a.poly(i, k);
        const pb = b.poly(k, j);
        for (let ch = 0; ch < params.crtCount; ch++) {
          const off = ch * n;
          for (let z = 0; z < n; z++) {
            dst[off + z] += pa[off + z] * pb[off + z];
          }
        }
      }
      for (let ch = 0; ch < params.crtCount; ch++) {
        const q = params.moduli[ch];
        const off = ch * n;
        for (let z = 0; z < n; z++) dst[off + z] %= q;
      }
    }
  }
  return out;
}

/** a: (1,1) NTT scalar; b: any NTT matrix. Pointwise product. */
export function scalarMultiply(
  params: Params,
  a: PolyMatrixNtt,
  b: PolyMatrixNtt
): PolyMatrixNtt {
  const out = PolyMatrixNtt.zero(params, b.rows, b.cols);
  const n = params.polyLen;
  const pa = a.poly(0, 0);
  for (let r = 0; r < b.rows; r++) {
    for (let c = 0; c < b.cols; c++) {
      const pb = b.poly(r, c);
      const dst = out.poly(r, c);
      for (let ch = 0; ch < params.crtCount; ch++) {
        const q = params.moduli[ch];
        const off = ch * n;
        for (let z = 0; z < n; z++) dst[off + z] = (pa[off + z] * pb[off + z]) % q;
      }
    }
  }
  return out;
}

export function add(params: Params, a: PolyMatrixNtt, b: PolyMatrixNtt): PolyMatrixNtt {
  const out = PolyMatrixNtt.zero(params, a.rows, a.cols);
  const n = params.polyLen;
  for (let i = 0; i < a.data.length; i++) out.data[i] = a.data[i] + b.data[i];
  const polys = a.rows * a.cols;
  for (let p = 0; p < polys; p++) {
    for (let ch = 0; ch < params.crtCount; ch++) {
      const q = params.moduli[ch];
      const off = (p * params.crtCount + ch) * n;
      for (let z = 0; z < n; z++) out.data[off + z] %= q;
    }
  }
  return out;
}

/** Negation in raw domain: Q - a (0 maps to Q, reduced downstream —
 * replicated from reference invert_poly for bit-exactness). */
export function invertRaw(params: Params, a: PolyMatrixRaw): PolyMatrixRaw {
  const out = PolyMatrixRaw.zero(params, a.rows, a.cols);
  for (let i = 0; i < a.data.length; i++) out.data[i] = params.modulus - a.data[i];
  return out;
}

/** x -> x^t automorphism on raw polys (poly.rs:393-405). */
export function automorphRaw(params: Params, a: PolyMatrixRaw, t: number): PolyMatrixRaw {
  const n = params.polyLen;
  const out = PolyMatrixRaw.zero(params, a.rows, a.cols);
  for (let r = 0; r < a.rows; r++) {
    for (let c = 0; c < a.cols; c++) {
      const src = a.poly(r, c);
      const dst = out.poly(r, c);
      for (let i = 0; i < n; i++) {
        const rem = (i * t) % n;
        const num = Math.floor((i * t) / n);
        dst[rem] = num % 2 === 0 ? src[i] : params.modulus - src[i];
      }
    }
  }
  return out;
}

export function stack(a: PolyMatrixRaw, b: PolyMatrixRaw): PolyMatrixRaw {
  const out = PolyMatrixRaw.zero(a.params, a.rows + b.rows, a.cols);
  out.data.set(a.data, 0);
  out.data.set(b.data, a.data.length);
  return out;
}

export function padTop(params: Params, a: PolyMatrixNtt, padRows: number): PolyMatrixNtt {
  const out = PolyMatrixNtt.zero(params, a.rows + padRows, a.cols);
  out.data.set(a.data, padRows * a.cols * params.crtCount * params.polyLen);
  return out;
}

/** Rotate rows down by one (last row to the top), poly.rs:340-349. */
export function shiftRowsByOne(a: PolyMatrixNtt): PolyMatrixNtt {
  if (a.rows === 1) return a.copy();
  const out = PolyMatrixNtt.zero(a.params, a.rows, a.cols);
  const rowSz = a.cols * a.params.crtCount * a.params.polyLen;
  out.data.set(a.data.subarray((a.rows - 1) * rowSz), 0);
  out.data.set(a.data.subarray(0, (a.rows - 1) * rowSz), rowSz);
  return out;
}

// --- gadget (reference gadget.rs) ---

export function getBitsPer(params: Params, dim: number): number {
  const modulusLog2 = params.modulusLog2;
  if (dim === modulusLog2) return 1;
  return Math.floor(modulusLog2 / dim) + 1;
}

export function buildGadget(params: Params, rows: number, cols: number): PolyMatrixRaw {
  const g = PolyMatrixRaw.zero(params, rows, cols);
  const numElems = cols / rows;
  if (!Number.isInteger(numElems)) throw new Error("cols must divide rows");
  const bitsPer = getBitsPer(params, numElems);
  for (let i = 0; i < rows; i++) {
    for (let j = 0; j < numElems; j++) {
      if (bitsPer * j >= 64) continue;
      g.data[(i * cols + (i + j * rows)) * params.polyLen] = 1n << BigInt(bitsPer * j);
    }
  }
  return g;
}
