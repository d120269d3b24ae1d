/** Spiral client: secret keys, public parameters, query generation, response
 * decoding, and seed-compressed serialization — a TypeScript port of
 * sdk_tpu/client.py (reference lib/spiral-rs/src/client.rs). Byte formats
 * are identical: every serialized matrix omits its pseudorandom first row,
 * regenerated from a 32-byte ChaCha20 seed as Q - (u64 % Q)
 * (client.rs:47-49, 68-93). */

import { invertUintMod, log2Ceil, recenter } from "./arith";
import { readFields, writeField } from "./bitpack";
import { ChaCha20Rng } from "./chacha20";
import { DiscreteGaussian } from "./gaussian";
import { HAMMING_WEIGHT, Params, Q2_VALUES, SEED_LENGTH } from "./params";
import {
  PolyMatrixNtt,
  PolyMatrixRaw,
  add,
  buildGadget,
  fromNtt,
  getBitsPer,
  invertRaw,
  multiply,
  padTop,
  scalarMultiply,
  shiftRowsByOne,
  stack,
  automorphRaw,
  toNtt,
} from "./poly";
import { concatBytes } from "../data/serializer";

/** Q - (u64 % Q) per draw (client.rs:47-49); 0 maps to Q, as in the ref. */
export function getInvFromRng(params: Params, rng: ChaCha20Rng, count: number): BigUint64Array {
  const out = rng.nextU64Array(count);
  for (let i = 0; i < count; i++) out[i] = params.modulus - (out[i] % params.modulus);
  return out;
}

/** Raw matrix -> bytes of rows 1.. as LE u64. */
export function serializeExclFirstRow(a: PolyMatrixRaw): Uint8Array {
  const polyLen = a.params.polyLen;
  const count = (a.rows - 1) * a.cols * polyLen;
  const out = new Uint8Array(count * 8);
  const dv = new DataView(out.buffer);
  const base = a.cols * polyLen; // skip first row
  for (let i = 0; i < count; i++) dv.setBigUint64(8 * i, a.data[base + i], true);
  return out;
}

/** NTT-domain (2,1) Regev cts -> packed u64 buffer laid out [z][j][r] with
 * channel-0 residue in the low 32 bits and channel-1 in the high
 * (util.rs:323-355). */
export function reorientRegCiphertexts(params: Params, vReg: PolyMatrixNtt[]): BigUint64Array {
  const n = params.polyLen;
  const num = vReg.length;
  const out = new BigUint64Array(n * num * 2);
  const [q0, q1] = params.moduli;
  for (let j = 0; j < num; j++) {
    const ct = vReg[j];
    for (let r = 0; r < 2; r++) {
      const p = ct.poly(r, 0);
      for (let z = 0; z < n; z++) {
        const v0 = p[z] % q0;
        const v1 = p[n + z] % q1;
        out[(z * num + j) * 2 + r] = v0 | (v1 << 32n);
      }
    }
  }
  return out;
}

export class PublicParameters {
  vPacking: PolyMatrixNtt[] = [];
  vExpansionLeft: PolyMatrixNtt[] | null = null;
  vExpansionRight: PolyMatrixNtt[] | null = null;
  vConversion: PolyMatrixNtt[] | null = null;
  seed: Uint8Array | null = null;

  serialize(params: Params): Uint8Array {
    const parts: Uint8Array[] = [];
    if (this.seed) parts.push(this.seed);
    const groups = [this.vPacking, this.vExpansionLeft, this.vExpansionRight, this.vConversion];
    for (const grp of groups) {
      if (grp === null) continue;
      for (const m of grp) parts.push(serializeExclFirstRow(fromNtt(params, m)));
    }
    return concatBytes(parts);
  }
}

export class Query {
  ct: PolyMatrixRaw | null = null; // raw (2, 1)
  vBuf: BigUint64Array | null = null; // packed reoriented buffer
  vCt: PolyMatrixRaw[] | null = null; // raw (2, 2*t_gsw) per further dim
  seed: Uint8Array | null = null;

  serialize(params: Params): Uint8Array {
    const parts: Uint8Array[] = [];
    if (this.seed) parts.push(this.seed);
    if (this.ct) parts.push(serializeExclFirstRow(this.ct));
    if (this.vBuf) {
      const count = this.vBuf.length >> 1;
      const out = new Uint8Array(count * 8);
      const dv = new DataView(out.buffer);
      for (let i = 0; i < count; i++) dv.setBigUint64(8 * i, this.vBuf[2 * i + 1], true);
      parts.push(out);
    }
    if (this.vCt) for (const m of this.vCt) parts.push(serializeExclFirstRow(m));
    return concatBytes(parts);
  }
}

export class SpiralClient {
  params: Params;
  skGsw: PolyMatrixRaw;
  skReg: PolyMatrixRaw;
  dg: DiscreteGaussian;

  constructor(params: Params) {
    this.params = params;
    this.skGsw = PolyMatrixRaw.zero(params, params.n, 1);
    this.skReg = PolyMatrixRaw.zero(params, 1, 1);
    this.dg = new DiscreteGaussian(params.noiseWidth);
  }

  // --- secret keys ---

  private genTernaryMat(mat: PolyMatrixRaw, hamming: number, rng: ChaCha20Rng): void {
    const params = this.params;
    const n = params.polyLen;
    for (let r = 0; r < mat.rows; r++) {
      for (let c = 0; c < mat.cols; c++) {
        const pol = mat.poly(r, c);
        for (let i = 0; i < n; i++) pol[i] = 0n;
        for (let i = 0; i < hamming; i++) pol[i] = 1n;
        for (let i = hamming; i < 2 * hamming; i++) pol[i] = params.modulus - 1n;
        // Fisher-Yates with u64 draws (same derivation as the Python SDK so
        // secret seeds are portable between the two clients; public wire
        // formats are independent of this choice)
        const draws = rng.nextU64Array(n - 1);
        for (let i = n - 1; i > 0; i--) {
          const j = Number(draws[n - 1 - i] % BigInt(i + 1));
          const t = pol[i];
          pol[i] = pol[j];
          pol[j] = t;
        }
      }
    }
  }

  generateSecretKeysFromSeed(seed: Uint8Array): void {
    const rng = new ChaCha20Rng(seed);
    this.genTernaryMat(this.skGsw, HAMMING_WEIGHT, rng);
    this.genTernaryMat(this.skReg, HAMMING_WEIGHT, rng);
  }

  // --- encryption primitives (client.rs:401-433) ---

  private noise(rows: number, cols: number, rng: ChaCha20Rng): PolyMatrixRaw {
    const params = this.params;
    const out = PolyMatrixRaw.zero(params, rows, cols);
    const vals = this.dg.sampleArray(params.modulus, rng, rows * cols * params.polyLen);
    out.data.set(vals);
    return out;
  }

  private getFreshGswPublicKey(m: number, rng: ChaCha20Rng, rngPub: ChaCha20Rng): PolyMatrixRaw {
    const params = this.params;
    const a = PolyMatrixRaw.randomFromRng(params, 1, m, rngPub);
    const e = this.noise(params.n, m, rng);
    let b = multiply(params, toNtt(params, this.skGsw), toNtt(params, a));
    b = add(params, toNtt(params, e), b);
    return stack(invertRaw(params, a), fromNtt(params, b));
  }

  private getRegevSample(rng: ChaCha20Rng, rngPub: ChaCha20Rng): PolyMatrixNtt {
    const params = this.params;
    const a = PolyMatrixRaw.randomFromRng(params, 1, 1, rngPub);
    const e = this.noise(1, 1, rng);
    let b = multiply(params, toNtt(params, this.skReg), toNtt(params, a));
    b = add(params, toNtt(params, e), b);
    const negA = toNtt(params, invertRaw(params, a));
    const out = PolyMatrixNtt.zero(params, 2, 1);
    out.data.set(negA.data, 0);
    out.data.set(b.data, negA.data.length);
    return out;
  }

  private getFreshRegPublicKey(m: number, rng: ChaCha20Rng, rngPub: ChaCha20Rng): PolyMatrixNtt {
    const params = this.params;
    const out = PolyMatrixNtt.zero(params, 2, m);
    for (let c = 0; c < m; c++) {
      const s = this.getRegevSample(rng, rngPub);
      const sz = params.crtCount * params.polyLen;
      out.poly(0, c).set(s.poly(0, 0).subarray(0, sz));
      out.poly(1, c).set(s.poly(1, 0).subarray(0, sz));
    }
    return out;
  }

  encryptMatrixGsw(agNtt: PolyMatrixNtt, rng: ChaCha20Rng, rngPub: ChaCha20Rng): PolyMatrixNtt {
    const params = this.params;
    const p = this.getFreshGswPublicKey(agNtt.cols, rng, rngPub);
    return add(params, toNtt(params, p), padTop(params, agNtt, 1));
  }

  encryptMatrixReg(aNtt: PolyMatrixNtt, rng: ChaCha20Rng, rngPub: ChaCha20Rng): PolyMatrixNtt {
    const p = this.getFreshRegPublicKey(aNtt.cols, rng, rngPub);
    return add(this.params, p, padTop(this.params, aNtt, 1));
  }

  // --- public parameters (client.rs:540-616) ---

  generateKeysFromSeed(
    seed: Uint8Array,
    noiseRng?: ChaCha20Rng,
    ppSeed?: Uint8Array
  ): PublicParameters {
    const params = this.params;
    this.generateSecretKeysFromSeed(seed);
    const rng = noiseRng ?? new ChaCha20Rng(randomBytes32());
    const seedPub = ppSeed ?? randomBytes32();
    const rngPub = new ChaCha20Rng(seedPub);
    const pp = new PublicParameters();
    pp.seed = seedPub;

    const skRegNtt = toNtt(params, this.skReg);
    const skGswNtt = toNtt(params, this.skGsw);

    const gadgetConvNtt = toNtt(params, buildGadget(params, 1, params.tConv));
    const numPackingMats = params.version === 0 ? params.n : 1;
    for (let i = 0; i < numPackingMats; i++) {
      const scaled = scalarMultiply(params, skRegNtt, gadgetConvNtt);
      const ag = PolyMatrixNtt.zero(params, params.n, params.tConv);
      // set row i of ag to `scaled`
      for (let c = 0; c < params.tConv; c++) ag.poly(i, c).set(scaled.poly(0, c));
      pp.vPacking.push(this.encryptMatrixGsw(ag, rng, rngPub));
    }

    if (params.version > 0) {
      const scaled = multiply(params, skGswNtt, gadgetConvNtt);
      pp.vPacking.push(this.encryptMatrixGsw(shiftRowsByOne(scaled), rng, rngPub));
    }

    if (params.expandQueries) {
      pp.vExpansionLeft = this.generateExpansionParams(params.g(), params.tExpLeft, rng, rngPub);
      if (params.version === 0 || params.tExpRight !== params.tExpLeft) {
        pp.vExpansionRight = this.generateExpansionParams(
          params.stopRound() + 1,
          params.tExpRight,
          rng,
          rngPub
        );
      } else {
        pp.vExpansionRight = null;
      }

      const gConv = buildGadget(params, 2, 2 * params.tConv);
      const skRegSqNtt = multiply(params, skRegNtt, skRegNtt);
      const conv = PolyMatrixNtt.zero(params, 2, 2 * params.tConv);
      for (let i = 0; i < 2 * params.tConv; i++) {
        let sigma: PolyMatrixNtt;
        if (i % 2 === 0) {
          const val = gConv.data[(0 * gConv.cols + i) * params.polyLen];
          sigma = scalarMultiply(
            params,
            toNtt(params, PolyMatrixRaw.singleValue(params, val)),
            skRegSqNtt
          );
        } else {
          const val = gConv.data[(1 * gConv.cols + i) * params.polyLen];
          sigma = scalarMultiply(
            params,
            toNtt(params, PolyMatrixRaw.singleValue(params, val)),
            skRegNtt
          );
        }
        const ct = this.encryptMatrixReg(sigma, rng, rngPub);
        conv.poly(0, i).set(ct.poly(0, 0));
        conv.poly(1, i).set(ct.poly(1, 0));
      }
      pp.vConversion = [conv];
    }
    return pp;
  }

  private generateExpansionParams(
    numExp: number,
    mExp: number,
    rng: ChaCha20Rng,
    rngPub: ChaCha20Rng
  ): PolyMatrixNtt[] {
    const params = this.params;
    const gExpNtt = toNtt(params, buildGadget(params, 1, mExp));
    const res: PolyMatrixNtt[] = [];
    for (let i = 0; i < numExp; i++) {
      const t = (params.polyLen >> i) + 1;
      const tauSkReg = automorphRaw(params, this.skReg, t);
      const prod = multiply(params, toNtt(params, tauSkReg), gExpNtt);
      res.push(this.encryptMatrixReg(prod, rng, rngPub));
    }
    return res;
  }

  // --- query (client.rs:618-721) ---

  generateQuery(idxTarget: number, noiseRng?: ChaCha20Rng, querySeed?: Uint8Array): Query {
    const params = this.params;
    const furtherDims = params.dbDim2;
    const idxDim0 = idxTarget >> furtherDims;
    const idxFurther = idxTarget & ((1 << furtherDims) - 1);
    const scaleK = params.modulus / params.ptModulus;
    const bitsPer = getBitsPer(params, params.tGsw);

    const rng = noiseRng ?? new ChaCha20Rng(randomBytes32());
    const query = new Query();
    query.seed = querySeed ?? randomBytes32();
    const rngPub = new ChaCha20Rng(query.seed);

    if (params.expandQueries) {
      const sigma = PolyMatrixRaw.zero(params, 1, 1);
      const pol = sigma.poly(0, 0);
      const inv2gFirst = invertUintMod(1n << BigInt(params.g()), params.modulus);
      const inv2gRest = invertUintMod(1n << BigInt(params.stopRound() + 1), params.modulus);
      if (params.dbDim2 === 0) {
        pol[idxDim0] = scaleK;
        for (let i = 0; i < params.polyLen; i++) {
          pol[i] = (pol[i] * inv2gFirst) % params.modulus;
        }
      } else {
        pol[2 * idxDim0] = scaleK;
        for (let i = 0; i < furtherDims; i++) {
          if ((idxFurther >> i) & 1) {
            for (let j = 0; j < params.tGsw; j++) {
              const idx = i * params.tGsw + j;
              pol[2 * idx + 1] = 1n << BigInt(bitsPer * j);
            }
          }
        }
        for (let i = 0; i < params.polyLen / 2; i++) {
          pol[2 * i] = (pol[2 * i] * inv2gFirst) % params.modulus;
          pol[2 * i + 1] = (pol[2 * i + 1] * inv2gRest) % params.modulus;
        }
      }
      const ctNtt = this.encryptMatrixReg(toNtt(params, sigma), rng, rngPub);
      query.ct = fromNtt(params, ctNtt);
    } else {
      const numExpanded = 1 << params.dbDim1;
      const regCts: PolyMatrixNtt[] = [];
      for (let i = 0; i < numExpanded; i++) {
        const value = i === idxDim0 ? scaleK : 0n;
        const sigma = PolyMatrixRaw.singleValue(params, value);
        regCts.push(this.encryptMatrixReg(toNtt(params, sigma), rng, rngPub));
      }
      query.vBuf = reorientRegCiphertexts(params, regCts);
      const skRegNtt = toNtt(params, this.skReg);
      const vCt: PolyMatrixRaw[] = [];
      for (let i = 0; i < furtherDims; i++) {
        const bit = (idxFurther >> i) & 1;
        const ctGswNtt = PolyMatrixNtt.zero(params, 2, 2 * params.tGsw);
        for (let j = 0; j < params.tGsw; j++) {
          const value = bit ? 1n << BigInt(bitsPer * j) : 0n;
          const sigmaNtt = toNtt(params, PolyMatrixRaw.singleValue(params, value));
          const prod = multiply(params, skRegNtt, sigmaNtt);
          let ct = this.encryptMatrixReg(prod, rng, rngPub);
          ctGswNtt.poly(0, 2 * j).set(ct.poly(0, 0));
          ctGswNtt.poly(1, 2 * j).set(ct.poly(1, 0));
          ct = this.encryptMatrixReg(sigmaNtt, rng, rngPub);
          ctGswNtt.poly(0, 2 * j + 1).set(ct.poly(0, 0));
          ctGswNtt.poly(1, 2 * j + 1).set(ct.poly(1, 0));
        }
        vCt.push(fromNtt(params, ctGswNtt));
      }
      query.vCt = vCt;
    }
    return query;
  }

  // --- decode (client.rs:732-810) ---

  decodeResponse(data: Uint8Array): Uint8Array {
    const params = this.params;
    const p = params.ptModulus;
    const pBits = log2Ceil(p);
    const q1 = 4n * p;
    const q1Bits = log2Ceil(q1);
    const q2 = Q2_VALUES[params.q2Bits];
    const q2Bits = params.q2Bits;

    const q2Params = params.cloneWithModuli([q2]);

    const skGswQ2 = PolyMatrixRaw.zero(q2Params, params.n, 1);
    for (let i = 0; i < params.polyLen * params.n; i++) {
      skGswQ2.data[i] = recenter(this.skGsw.data[i], params.modulus, q2);
    }
    const skGswQ2Ntt = toNtt(q2Params, skGswQ2);

    const nPoly = params.polyLen;
    // result: (instances * n, n, polyLen) mod-p values
    const result = new BigUint64Array(params.instances * params.n * params.n * nPoly);
    let bitOffs = 0;
    for (let instance = 0; instance < params.instances; instance++) {
      const cnt1 = params.n * nPoly;
      const firstRow = readFields(data, bitOffs, q2Bits, cnt1);
      bitOffs += q2Bits * cnt1;
      const cnt2 = params.n * params.n * nPoly;
      const restRows = readFields(data, bitOffs, q1Bits, cnt2);
      bitOffs += q1Bits * cnt2;

      const firstRowMat = new PolyMatrixRaw(q2Params, 1, params.n, firstRow);
      const skProd = fromNtt(
        q2Params,
        multiply(q2Params, skGswQ2Ntt, toNtt(q2Params, firstRowMat))
      );

      const denom = q2 * (q1 / p);
      for (let r = 0; r < params.n; r++) {
        for (let c = 0; c < params.n; c++) {
          for (let z = 0; z < nPoly; z++) {
            let vf = skProd.data[(r * params.n + c) * nPoly + z];
            if (vf >= q2 / 2n) vf -= q2;
            let vr = restRows[(r * params.n + c) * nPoly + z];
            if (vr >= q1 / 2n) vr -= q1;
            const rr = vf * q1 + vr * q2;
            const sign = rr >= 0n ? 1n : -1n;
            const shifted = rr + sign * (denom / 2n);
            const mag = shifted < 0n ? -shifted : shifted;
            let res = (shifted < 0n ? -1n : 1n) * (mag / denom);
            res = (res + (denom / p) * p + 2n * p) % p;
            result[((instance * params.n + r) * params.n + c) * nPoly + z] = res;
          }
        }
      }
    }

    return rawToBytes(params, result, params.instances * params.n, params.n, pBits,
      params.modpWordsPerChunk());
  }
}

/** PolyMatrixRaw::to_vec (poly.rs:213-235): bit-pack the first numCoeffs
 * coefficients of each poly with modulusBits bits each, rounding the bit
 * cursor down to a byte boundary after each poly. */
export function rawToBytes(
  params: Params,
  data: BigUint64Array,
  rows: number,
  cols: number,
  modulusBits: number,
  numCoeffs: number
): Uint8Array {
  const szBits = rows * cols * numCoeffs * modulusBits;
  let szBytes = Math.floor((szBits + 7) / 8) + 32;
  szBytes = Math.ceil(szBytes / 16) * 16;
  const out = new Uint8Array(szBytes);
  let bitOffs = 0;
  for (let r = 0; r < rows; r++) {
    for (let c = 0; c < cols; c++) {
      const base = (r * cols + c) * params.polyLen;
      for (let i = 0; i < numCoeffs; i++) {
        writeField(out, data[base + i], bitOffs + i * modulusBits, modulusBits);
      }
      bitOffs += numCoeffs * modulusBits;
      bitOffs = (bitOffs >> 3) << 3;
    }
  }
  return out;
}

export function randomBytes32(): Uint8Array {
  const out = new Uint8Array(32);
  const g = globalThis as { crypto?: { getRandomValues?: (b: Uint8Array) => void } };
  if (g.crypto?.getRandomValues) {
    g.crypto.getRandomValues(out);
  } else {
    throw new Error("no secure randomness source available");
  }
  return out;
}
