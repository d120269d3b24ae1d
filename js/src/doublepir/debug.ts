/** Cross-implementation debugging aids (reference
 * lib/doublepir/src/matrix/matrix.rs:176-196, util/{checksum,log}.rs;
 * mirrors sdk_tpu/doublepir/debug.py).
 *
 * The SAME named XOR-checksum fingerprints print from this TS client, the
 * Python scheme and the device server, so a state divergence between the
 * two client codebases and the server localizes to the first differing
 * name. `{msg}: {checksum}` is the byte-identical line format. */

export const ERROR = 0;
export const WARN = 1;
export const INFO = 2;
export const DEBUG = 3;

/** Runtime analog of the reference's compile-time consts (matrix.rs:19-24,
 * log.rs:10-14): full checksums cost a pass over the data, and logging
 * measurably slows the kernels — both default OFF. */
export let computeFullChecksums = false;
export let hardQuiet = true;
let level = ERROR;

export function setLevel(l: number): void {
  level = l;
}

export function setComputeFullChecksums(v: boolean): void {
  computeFullChecksums = v;
}

export function setHardQuiet(v: boolean): void {
  hardQuiet = v;
}

function log(atLevel: number, msg: string): void {
  if (hardQuiet || level < atLevel) return;
  // eslint-disable-next-line no-console
  console.error(msg);
}

export function info(msg: string): void {
  log(INFO, msg);
}

export function debugLog(msg: string): void {
  log(DEBUG, msg);
}

/** XOR of all u32 values (reference util/checksum.rs:11-17). */
export function checksumU32(data: Uint32Array): number {
  let c = 0;
  for (let i = 0; i < data.length; i++) c = (c ^ data[i]) >>> 0;
  return c >>> 0;
}

/** XOR of all bytes (reference util/checksum.rs:2-8). */
export function checksumU8(data: Uint8Array): number {
  let c = 0;
  for (let i = 0; i < data.length; i++) c ^= data[i];
  return c;
}

/** Gated fingerprint (reference Matrix::checksum): 0 unless enabled. */
export function matrixChecksum(data: Uint32Array): number {
  if (!computeFullChecksums) return 0;
  return checksumU32(data);
}

/** Reference Matrix::print_checksum — `{msg}: {checksum}` at DEBUG. */
export function printChecksum(msg: string, data: Uint32Array): void {
  if (hardQuiet || level < DEBUG) return; // skip the data pass entirely
  debugLog(`${msg}: ${matrixChecksum(data)}`);
}
