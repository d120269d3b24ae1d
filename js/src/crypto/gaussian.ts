/** Discrete Gaussian sampler over Z, CDF-table based, matching the reference
 * (lib/spiral-rs/src/discrete_gaussian.rs) and sdk_tpu/discrete_gaussian.py:
 * width 6.4, support [-26, 26], inverse-CDF sampling from u64 draws.
 *
 * The width-6.4 CDF table is embedded as integer constants (generated from
 * the Python implementation) so the sampler is bit-exact regardless of the
 * JS engine's libm — f64 exp() rounding must not leak into wire bytes. */

import { ChaCha20Rng } from "./chacha20";

export const NUM_WIDTHS = 4;

const CDF_TABLE_6_4: bigint[] = [
  0n, 0n, 0n, 7n,
  225n, 6114n, 142809n, 2864512n,
  49349166n, 730367088n, 9288667698n, 101545086850n,
  954617134063n, 7720973857474n, 53757667977838n, 322436486442815n,
  1667499996257362n, 7443566871362058n, 28720140744863912n, 95948302954529184n,
  278161926109627936n, 701795634139702528n, 1546646853635105024n, 2991920295851131904n,
  5112721055115152384n, 7782220156096217088n, 10664523917613334528n, 13334023018594400256n,
  15454823777858420736n, 16900097220074446848n, 17744948439569850368n, 18168582147599925248n,
  18350795770755024896n, 18418023932964689920n, 18439300506838192128n, 18445076573713297408n,
  18446421637223112704n, 18446690316041578496n, 18446736352735698944n, 18446743119092422656n,
  18446743972164470784n, 18446744064420890624n, 18446744072979191808n, 18446744073660209152n,
  18446744073706694656n, 18446744073709416448n, 18446744073709551615n, 18446744073709551615n,
  18446744073709551615n, 18446744073709551615n, 18446744073709551615n, 18446744073709551615n,
  18446744073709551615n,
];

export class DiscreteGaussian {
  maxVal: number;
  cdfTable: bigint[];

  constructor(noiseWidth: number) {
    this.maxVal = Math.ceil(noiseWidth * NUM_WIDTHS);
    if (noiseWidth === 6.4) {
      this.cdfTable = CDF_TABLE_6_4;
    } else {
      // generic construction (matches the Python float math for widths whose
      // exp() values round identically; 6.4 — the only width the reference
      // ships — always uses the pinned table above)
      const probs: number[] = [];
      let total = 0;
      for (let i = -this.maxVal; i <= this.maxVal; i++) {
        const p = Math.exp((-Math.PI * i * i) / (noiseWidth * noiseWidth));
        probs.push(p);
        total += p;
      }
      const table: bigint[] = [];
      let cum = 0;
      const MAX = 18446744073709551615n;
      for (const p of probs) {
        cum += p / total;
        const v = BigInt(Math.round(cum * 18446744073709551615));
        table.push(v > MAX ? MAX : v);
      }
      this.cdfTable = table;
    }
  }

  /** One sample as a value mod `modulus`, consuming one u64 draw.
   *
   * Constant-time selection (reference discrete_gaussian.rs:78-139, which
   * scans the FULL table with `subtle`'s branch-free comparisons): every
   * draw reads every table entry and accumulates the index arithmetically
   * — no draw-dependent branch or memory index (a binary search walks a
   * secret-dependent path). The count of entries < draw IS the first index
   * with cdf[idx] >= draw, so values are unchanged. */
  sample(modulus: bigint, rng: ChaCha20Rng): bigint {
    const draw = rng.nextU64();
    let idx = 0;
    for (let i = 0; i < this.cdfTable.length; i++) {
      idx += Number(this.cdfTable[i] < draw); // 0/1, no branch
    }
    const val = BigInt(idx - this.maxVal);
    // branch-free recenter: arithmetic-shift sign mask (0n or -1n; bigint
    // & sign-extends, so modulus & -1n === modulus and modulus & 0n === 0n)
    const mask = val >> 63n;
    return val + (modulus & mask);
  }

  sampleArray(modulus: bigint, rng: ChaCha20Rng, count: number): BigUint64Array {
    const out = new BigUint64Array(count);
    for (let i = 0; i < count; i++) out[i] = this.sample(modulus, rng);
    return out;
  }
}
