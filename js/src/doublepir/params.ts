/** DoublePIR parameters + DbInfo (reference lib/doublepir/src/params/*,
 * database/database.rs; mirrors sdk_tpu/doublepir/{params,database}.py).
 * CSV wire formats identical. */

export class DpParams {
  constructor(
    public n: number,
    public sigma: number,
    public l: number,
    public m: number,
    public logq: number,
    public p: number
  ) {}

  extDelta(): number {
    return Math.floor(2 ** this.logq / this.p);
  }

  delta(): number {
    return Math.ceil(this.logq / Math.log2(this.p));
  }

  round(x: number): number {
    const ed = this.extDelta();
    return Math.floor((x + Math.floor(ed / 2)) / ed) % this.p;
  }

  static fromString(s: string): DpParams {
    const [n, sigma, l, m, logq, p] = s.split(",");
    return new DpParams(
      Number(n),
      Number(sigma),
      Number(l),
      Number(m),
      Number(logq),
      Number(p)
    );
  }

  toString(): string {
    const s =
      this.sigma === Math.floor(this.sigma) ? String(Math.floor(this.sigma)) : String(this.sigma);
    return `${this.n},${s},${this.l},${this.m},${this.logq},${this.p}`;
  }
}

export class DbInfo {
  constructor(
    public numEntries: number,
    public bitsPerEntry: number,
    public packing: number,
    public ne: number,
    public x: number,
    public p: number,
    public logq: number,
    public squishBasis = 10,
    public squishDelta = 0,
    public origCols = 0
  ) {}

  static fromString(s: string): DbInfo {
    const v = s.split(",").map(Number);
    return new DbInfo(v[0], v[1], v[2], v[3], v[4], v[5], v[6], v[7], v[8], v[9]);
  }
}

function baseP(p: number, m: number, i: number): number {
  let v = m;
  for (let k = 0; k < i; k++) v = Math.floor(v / p);
  return v % p;
}

function reconstructFromBaseP(p: number, vals: number[]): number {
  let res = 0;
  let coeff = 1;
  for (let i = 0; i < vals.length; i++) {
    res += coeff * vals[i];
    if (i < vals.length - 1) coeff *= p;
  }
  return res;
}

/** Recompose one DB entry from recovered Z_p values
 * (reference database.rs:287-305). */
export function reconstructElem(vals: number[], index: number, info: DbInfo): number {
  const q = 2 ** info.logq;
  const adj = vals.map((v) => ((v + Math.floor(info.p / 2)) % q) % info.p);
  let val = reconstructFromBaseP(info.p, adj);
  if (info.packing > 0) {
    val = baseP(2 ** info.bitsPerEntry, val, index % info.packing);
  }
  return val;
}
