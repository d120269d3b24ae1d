/** Modular arithmetic helpers over bigint (mirrors sdk_tpu/arith.py and the
 * reference lib/spiral-rs/src/arith.rs + number_theory.rs). All Spiral
 * client-side values fit in u64; bigint keeps every operation exact. */

export function log2Exact(a: number): number {
  let n = 0;
  while (1 << n < a) n += 1;
  if (1 << n !== a) throw new Error(`not a power of two: ${a}`);
  return n;
}

export function log2Ceil(a: bigint | number): number {
  const v = BigInt(a);
  if (v <= 1n) return 0;
  let n = 0n;
  let x = v - 1n;
  while (x > 0n) {
    x >>= 1n;
    n += 1n;
  }
  return Number(n);
}

export function multiplyUintMod(a: bigint, b: bigint, modulus: bigint): bigint {
  return (a * b) % modulus;
}

export function exponentiateUintMod(
  operand: bigint,
  exponent: bigint,
  modulus: bigint
): bigint {
  let result = 1n;
  let base = operand % modulus;
  let e = exponent;
  while (e > 0n) {
    if (e & 1n) result = (result * base) % modulus;
    base = (base * base) % modulus;
    e >>= 1n;
  }
  return result;
}

export function invertUintMod(value: bigint, modulus: bigint): bigint {
  // extended gcd
  let [old_r, r] = [value % modulus, modulus];
  let [old_s, s] = [1n, 0n];
  while (r !== 0n) {
    const q = old_r / r;
    [old_r, r] = [r, old_r - q * r];
    [old_s, s] = [s, old_s - q * s];
  }
  if (old_r !== 1n) throw new Error("not invertible");
  return ((old_s % modulus) + modulus) % modulus;
}

export function reverseBits(x: number, bitCount: number): number {
  let out = 0;
  for (let i = 0; i < bitCount; i++) {
    out |= ((x >> i) & 1) << (bitCount - 1 - i);
  }
  return out >>> 0;
}

export function div2UintMod(operand: bigint, modulus: bigint): bigint {
  if (operand & 1n) return (operand + modulus) >> 1n;
  return operand >> 1n;
}

/** Recenter a mod-`from` value into mod-`to` (reference arith.rs:91-104). */
export function recenter(val: bigint, fromModulus: bigint, toModulus: bigint): bigint {
  let a = val;
  if (val >= fromModulus / 2n) a -= fromModulus;
  a = a + (fromModulus / toModulus) * toModulus + 2n * toModulus;
  return a % toModulus;
}
