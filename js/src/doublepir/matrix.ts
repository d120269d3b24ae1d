/** u32 matrix helpers for the DoublePIR client (reference
 * lib/doublepir/src/matrix/*; mirrors sdk_tpu/doublepir/matrix.py).
 * All arithmetic wraps mod 2^32 (Math.imul + >>> 0). */

export const SQUISH_BASIS = 10;
export const SQUISH_DELTA = 3;

export class Mat {
  constructor(
    public rows: number,
    public cols: number,
    public data: Uint32Array
  ) {
    if (data.length !== rows * cols) throw new Error("bad matrix size");
  }

  static zero(rows: number, cols: number): Mat {
    return new Mat(rows, cols, new Uint32Array(rows * cols));
  }

  get(r: number, c: number): number {
    return this.data[r * this.cols + c];
  }

  set(r: number, c: number, v: number): void {
    this.data[r * this.cols + c] = v >>> 0;
  }

  addInPlace(other: Mat): void {
    for (let i = 0; i < this.data.length; i++) {
      this.data[i] = (this.data[i] + other.data[i]) >>> 0;
    }
  }

  addScalarInPlace(v: number): void {
    for (let i = 0; i < this.data.length; i++) {
      this.data[i] = (this.data[i] + v) >>> 0;
    }
  }

  subInPlace(other: Mat): void {
    for (let i = 0; i < this.data.length; i++) {
      this.data[i] = (this.data[i] - other.data[i]) >>> 0;
    }
  }

  copy(): Mat {
    return new Mat(this.rows, this.cols, this.data.slice());
  }

  /** Vertical stack. */
  static vstack(a: Mat, b: Mat): Mat {
    if (a.cols !== b.cols) throw new Error("col mismatch");
    const out = new Mat(a.rows + b.rows, a.cols, new Uint32Array((a.rows + b.rows) * a.cols));
    out.data.set(a.data, 0);
    out.data.set(b.data, a.data.length);
    return out;
  }

  slice(rowStart: number, rowEnd: number): Mat {
    return new Mat(
      rowEnd - rowStart,
      this.cols,
      this.data.slice(rowStart * this.cols, rowEnd * this.cols)
    );
  }
}

/** Exact wrapping (mod 2^32) u32 matmul. */
export function matmulU32(a: Mat, b: Mat): Mat {
  if (a.cols !== b.rows) throw new Error("shape mismatch");
  const out = Mat.zero(a.rows, b.cols);
  for (let i = 0; i < a.rows; i++) {
    for (let j = 0; j < b.cols; j++) {
      let acc = 0;
      for (let k = 0; k < a.cols; k++) {
        acc = (acc + Math.imul(a.data[i * a.cols + k], b.data[k * b.cols + j])) | 0;
      }
      out.data[i * b.cols + j] = acc >>> 0;
    }
  }
  return out;
}

/** Uniform u32 matrix from crypto randomness. */
export function randomU32(rows: number, cols: number): Mat {
  const data = new Uint32Array(rows * cols);
  const g = globalThis as { crypto?: { getRandomValues?: (b: Uint32Array) => void } };
  if (!g.crypto?.getRandomValues) throw new Error("no randomness source");
  // getRandomValues caps at 64 KiB per call
  for (let off = 0; off < data.length; off += 16384) {
    g.crypto.getRandomValues(data.subarray(off, Math.min(off + 16384, data.length)));
  }
  return new Mat(rows, cols, data);
}

/** sigma=6.4 discrete gaussian via Box-Muller; negatives as two's-complement
 * u32 (reference matrix/gaussian.rs — rounded N(0, 6.4^2); the exact float
 * sampler differs per platform, which is fine: only the distribution
 * matters for LWE noise, never wire bytes). */
export function gaussianMat(rows: number, cols: number): Mat {
  const out = Mat.zero(rows, cols);
  const uniform = randomU32(2 * rows * cols, 1).data;
  for (let i = 0; i < rows * cols; i++) {
    const u1 = (uniform[2 * i] + 1) / 4294967297; // in (0, 1)
    const u2 = uniform[2 * i + 1] / 4294967296;
    const z = Math.sqrt(-2 * Math.log(u1)) * Math.cos(2 * Math.PI * u2);
    out.data[i] = Math.round(z * 6.4) >>> 0; // wraps negatives
  }
  return out;
}

/** (val + p/2) truncated to u32, then mod p (reference arith.rs:24-27). */
export function centeredToRaw(val: number, modulus: number): number {
  const s = (val + Math.floor(modulus / 2)) >>> 0;
  return s % modulus;
}

/** (rows, cols) -> (rows/delta, cols): recompose base-p from centered digits
 * (contract.rs:35-53). Arithmetic — including the p^f coefficient
 * progression — wraps mod 2^32. */
export function contract(m: Mat, modulus: number, delta: number): Mat {
  const outRows = m.rows / delta;
  const out = Mat.zero(outRows, m.cols);
  let coeff = 1;
  for (let f = 0; f < delta; f++) {
    for (let r = 0; r < outRows; r++) {
      for (let c = 0; c < m.cols; c++) {
        const digit = centeredToRaw(m.get(r * delta + f, c), modulus);
        out.data[r * m.cols + c] =
          (out.data[r * m.cols + c] + Math.imul(digit, coeff)) >>> 0;
      }
    }
    coeff = Math.imul(coeff, modulus) >>> 0;
  }
  return out;
}
