/** 32-byte base64 client seeds; every client secret derives from one
 * (reference js/client/seed.ts). */

import { base64ToBytes, bytesToBase64 } from "../data/base64";
import { randomBytes32 } from "../crypto/client";

export const SEED_BYTES = 32;
export const SEED_STR_LEN = 44;

export function stringFromSeed(seed: Uint8Array): string {
  if (seed.length !== SEED_BYTES) throw new Error("bad seed length");
  const s = bytesToBase64(seed);
  if (s.length !== SEED_STR_LEN) throw new Error("bad seed encoding");
  return s;
}

export function seedFromString(seedStr: string): Uint8Array {
  if (seedStr.length !== SEED_STR_LEN) throw new Error("bad seed string");
  const seed = base64ToBytes(seedStr);
  if (seed.length !== SEED_BYTES) throw new Error("bad seed string");
  return seed;
}

export function getRandomSeed(): string {
  return stringFromSeed(randomBytes32());
}
