/** Spiral scheme parameters — JSON schema identical to the reference
 * (lib/spiral-rs/src/params.rs, util.rs:219-263); mirrors sdk_tpu/params.py. */

import {
  div2UintMod,
  exponentiateUintMod,
  invertUintMod,
  log2Ceil,
  log2Exact,
  multiplyUintMod,
  reverseBits,
} from "./arith";

export const SEED_LENGTH = 32;
export const HAMMING_WEIGHT = 256;
export const MIN_Q2_BITS = 14;

export const DEFAULT_MODULI: [bigint, bigint] = [268369921n, 249561089n];

// Reference params.rs:8-46
export const Q2_VALUES: bigint[] = [
  0n, 0n, 0n, 0n, 0n, 0n, 0n, 0n, 0n, 0n, 0n, 0n, 0n, 0n,
  12289n, 12289n, 61441n, 65537n, 65537n, 520193n, 786433n, 786433n,
  3604481n, 7340033n, 16515073n, 33292289n, 67043329n, 132120577n,
  268369921n, 469762049n, 1073479681n, 2013265921n, 4293918721n,
  8588886017n, 17175674881n, 34359214081n, 68718428161n,
];

export function isPrimitiveRoot(root: bigint, degree: number, modulus: bigint): boolean {
  if (root === 0n) return false;
  return exponentiateUintMod(root, BigInt(degree >> 1), modulus) === modulus - 1n;
}

export function getMinimalPrimitiveRoot(degree: number, modulus: bigint): bigint {
  const group = modulus - 1n;
  const quotient = group / BigInt(degree);
  if (group % BigInt(degree) !== 0n) throw new Error("degree does not divide group");
  let root: bigint | null = null;
  for (let cand = 2n; cand < 10000n; cand++) {
    const r = exponentiateUintMod(cand, quotient, modulus);
    if (isPrimitiveRoot(r, degree, modulus)) {
      root = r;
      break;
    }
  }
  if (root === null) throw new Error("no root found");
  const genSq = multiplyUintMod(root, root, modulus);
  let cur = root;
  let best = root;
  for (let i = 0; i < degree; i++) {
    if (cur < best) best = cur;
    cur = multiplyUintMod(cur, genSq, modulus);
  }
  return best;
}

export interface NttTables {
  rootPowers: BigUint64Array;
  scaledRootPowers: BigUint64Array;
  invRootPowers: BigUint64Array;
  scaledInvRootPowers: BigUint64Array;
}

/** Shoup NTT tables, identical to reference ntt.rs:39-65. */
export function buildNttTables(polyLen: number, moduli: bigint[]): NttTables[] {
  const polyLenLog2 = log2Exact(polyLen);
  const out: NttTables[] = [];
  for (const modulus of moduli) {
    const root = getMinimalPrimitiveRoot(2 * polyLen, modulus);
    const invRoot = invertUintMod(root, modulus);

    const powersOf = (r: bigint): BigUint64Array => {
      const tbl = new BigUint64Array(polyLen);
      let power = r;
      for (let i = 1; i < polyLen; i++) {
        const idx = reverseBits(i, polyLenLog2);
        tbl[idx] = power;
        power = multiplyUintMod(power, r, modulus);
      }
      tbl[0] = 1n;
      return tbl;
    };

    const rootPowers = powersOf(root);
    const invRootPowers = powersOf(invRoot);
    for (let i = 0; i < polyLen; i++) {
      invRootPowers[i] = div2UintMod(invRootPowers[i], modulus);
    }

    const scaleU32 = (tbl: BigUint64Array): BigUint64Array => {
      const scaled = new BigUint64Array(polyLen);
      for (let i = 0; i < polyLen; i++) {
        scaled[i] = ((tbl[i] << 32n) / modulus) & 0xffffffffn;
      }
      return scaled;
    };

    out.push({
      rootPowers,
      scaledRootPowers: scaleU32(rootPowers),
      invRootPowers,
      scaledInvRootPowers: scaleU32(invRootPowers),
    });
  }
  return out;
}

export class Params {
  polyLen: number;
  moduli: bigint[];
  noiseWidth: number;
  n: number;
  ptModulus: bigint;
  q2Bits: number;
  tConv: number;
  tExpLeft: number;
  tExpRight: number;
  tGsw: number;
  expandQueries: boolean;
  dbDim1: number;
  dbDim2: number;
  instances: number;
  dbItemSize: number;
  version: number;

  polyLenLog2: number;
  crtCount: number;
  modulus: bigint;
  modulusLog2: number;
  invQ0ModQ1 = 0n;
  private nttTablesCache: NttTables[] | null = null;

  constructor(opts: {
    polyLen?: number;
    moduli?: bigint[];
    noiseWidth?: number;
    n: number;
    ptModulus: bigint;
    q2Bits: number;
    tConv: number;
    tExpLeft: number;
    tExpRight: number;
    tGsw: number;
    expandQueries: boolean;
    dbDim1: number;
    dbDim2: number;
    instances: number;
    dbItemSize: number;
    version: number;
  }) {
    this.polyLen = opts.polyLen ?? 2048;
    this.moduli = opts.moduli ?? [...DEFAULT_MODULI];
    this.noiseWidth = opts.noiseWidth ?? 6.4;
    this.n = opts.n;
    this.ptModulus = opts.ptModulus;
    this.q2Bits = opts.q2Bits;
    this.tConv = opts.tConv;
    this.tExpLeft = opts.tExpLeft;
    this.tExpRight = opts.tExpRight;
    this.tGsw = opts.tGsw;
    this.expandQueries = opts.expandQueries;
    this.dbDim1 = opts.dbDim1;
    this.dbDim2 = opts.dbDim2;
    this.instances = opts.instances;
    this.dbItemSize = opts.dbItemSize;
    this.version = opts.version;

    if (this.q2Bits < MIN_Q2_BITS) throw new Error("q2_bits too small");
    this.polyLenLog2 = log2Exact(this.polyLen);
    this.crtCount = this.moduli.length;
    this.modulus = this.moduli.reduce((a, b) => a * b, 1n);
    this.modulusLog2 = log2Ceil(this.modulus);
    if (this.crtCount === 2) {
      this.invQ0ModQ1 = invertUintMod(this.moduli[0], this.moduli[1]);
    }
  }

  nttTables(): NttTables[] {
    if (this.nttTablesCache === null) {
      this.nttTablesCache = buildNttTables(this.polyLen, this.moduli);
    }
    return this.nttTablesCache;
  }

  numExpanded(): number {
    return 1 << this.dbDim1;
  }

  numItems(): number {
    return (1 << this.dbDim1) * (1 << this.dbDim2);
  }

  itemSize(): number {
    const logp = log2Exact(Number(this.ptModulus));
    return (this.instances * this.n * this.n * this.polyLen * logp) / 8;
  }

  g(): number {
    const numBitsToGen = this.tGsw * this.dbDim2 + this.numExpanded();
    return log2Ceil(BigInt(numBitsToGen));
  }

  stopRound(): number {
    return log2Ceil(BigInt(this.tGsw * this.dbDim2));
  }

  setupBytes(): number {
    let szPolys = 0;
    const numPackingMats = this.version === 0 ? this.n : 2;
    szPolys += numPackingMats * this.n * this.tConv;
    if (this.expandQueries) {
      const expansionLeftSz = this.g() * this.tExpLeft;
      let expansionRightSz = (this.stopRound() + 1) * this.tExpRight;
      const conversionSz = 2 * this.tConv;
      if (this.version > 0 && this.tExpLeft === this.tExpRight) expansionRightSz = 0;
      szPolys += expansionLeftSz + expansionRightSz + conversionSz;
    }
    return SEED_LENGTH + szPolys * this.polyLen * 8;
  }

  queryBytes(): number {
    const szPolys = this.expandQueries
      ? 1
      : this.numExpanded() + this.dbDim2 * 2 * this.tGsw;
    return SEED_LENGTH + szPolys * this.polyLen * 8;
  }

  bytesPerChunk(): number {
    const chunks = this.instances * this.n * this.n;
    return Math.ceil(this.dbItemSize / chunks);
  }

  modpWordsPerChunk(): number {
    const logp = log2Exact(Number(this.ptModulus));
    return Math.ceil((this.bytesPerChunk() * 8) / logp);
  }

  /** Garner compose per coefficient: residues (x mod q0, y mod q1) -> mod Q. */
  crtCompose2(x: bigint, y: bigint): bigint {
    const [q0, q1] = this.moduli;
    const t = (((y + q1 - (x % q1)) % q1) * this.invQ0ModQ1) % q1;
    return x + q0 * t;
  }

  cloneWithModuli(moduli: bigint[]): Params {
    return new Params({
      polyLen: this.polyLen,
      moduli,
      noiseWidth: this.noiseWidth,
      n: this.n,
      ptModulus: this.ptModulus,
      q2Bits: this.q2Bits,
      tConv: this.tConv,
      tExpLeft: this.tExpLeft,
      tExpRight: this.tExpRight,
      tGsw: this.tGsw,
      expandQueries: this.expandQueries,
      dbDim1: this.dbDim1,
      dbDim2: this.dbDim2,
      instances: this.instances,
      dbItemSize: this.dbItemSize,
      version: this.version,
    });
  }
}

/** Reference util.rs:224-263; identical JSON schema. */
export function paramsFromJsonObj(v: Record<string, unknown>): Params {
  const n = Number(v["n"]);
  const instances = Number(v["instances"] ?? 1);
  const p = BigInt(v["p"] as number);
  const q2Bits = Math.max(Number(v["q2_bits"]), MIN_Q2_BITS);
  let dbItemSize = Number(v["db_item_size"] ?? 0);
  if (dbItemSize === 0) {
    dbItemSize = (instances * n * n * 2048 * log2Ceil(p)) / 8;
  }
  return new Params({
    n,
    ptModulus: p,
    q2Bits,
    tConv: Number(v["t_conv"]),
    tExpLeft: Number(v["t_exp_left"]),
    tExpRight: Number(v["t_exp_right"]),
    tGsw: Number(v["t_gsw"]),
    expandQueries: !("direct_upload" in v),
    dbDim1: Number(v["nu_1"]),
    dbDim2: Number(v["nu_2"]),
    instances,
    dbItemSize,
    version: Number(v["version"] ?? 0),
  });
}

export function paramsFromJson(cfg: string): Params {
  return paramsFromJsonObj(JSON.parse(cfg));
}
