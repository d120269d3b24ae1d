/** DoublePIR wire serialization, byte-compatible with the reference
 * (lib/doublepir/src/serializer/serializer.rs): u32-BE rows, cols, then
 * values row-major; State = u32-BE count + matrices. */

import { concatBytes } from "../data/serializer";
import { Mat } from "./matrix";

const MAX_LEN = 1 << 28;

export function serializeMatrix(m: Mat): Uint8Array {
  const out = new Uint8Array(8 + m.data.length * 4);
  const dv = new DataView(out.buffer);
  dv.setUint32(0, m.rows, false);
  dv.setUint32(4, m.cols, false);
  for (let i = 0; i < m.data.length; i++) dv.setUint32(8 + 4 * i, m.data[i], false);
  return out;
}

export function deserializeMatrix(data: Uint8Array, offs: number): [Mat, number] {
  const dv = new DataView(data.buffer, data.byteOffset, data.byteLength);
  const rows = dv.getUint32(offs, false);
  const cols = dv.getUint32(offs + 4, false);
  if (rows >= MAX_LEN || cols >= MAX_LEN) throw new Error("bad matrix header");
  const n = rows * cols;
  const vals = new Uint32Array(n);
  for (let i = 0; i < n; i++) vals[i] = dv.getUint32(offs + 8 + 4 * i, false);
  return [new Mat(rows, cols, vals), offs + 8 + 4 * n];
}

export function serializeState(state: Mat[]): Uint8Array {
  const head = new Uint8Array(4);
  new DataView(head.buffer).setUint32(0, state.length, false);
  return concatBytes([head, ...state.map(serializeMatrix)]);
}

export function deserializeState(data: Uint8Array, offs = 0): [Mat[], number] {
  const dv = new DataView(data.buffer, data.byteOffset, data.byteLength);
  const count = dv.getUint32(offs, false);
  if (count >= MAX_LEN) throw new Error("bad state header");
  let o = offs + 4;
  const out: Mat[] = [];
  for (let i = 0; i < count; i++) {
    const [m, no] = deserializeMatrix(data, o);
    out.push(m);
    o = no;
  }
  return [out, o];
}

export function serializeStates(states: Mat[][]): Uint8Array {
  const head = new Uint8Array(4);
  new DataView(head.buffer).setUint32(0, states.length, false);
  return concatBytes([head, ...states.map(serializeState)]);
}

export function deserializeStates(data: Uint8Array): Mat[][] {
  const dv = new DataView(data.buffer, data.byteOffset, data.byteLength);
  const count = dv.getUint32(0, false);
  let offs = 4;
  const out: Mat[][] = [];
  for (let i = 0; i < count; i++) {
    const [s, no] = deserializeState(data, offs);
    out.push(s);
    offs = no;
  }
  return out;
}
