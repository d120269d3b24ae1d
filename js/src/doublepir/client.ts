/** DoublePIR client: query generation, batch planning, response recovery
 * (reference lib/doublepir/src/doublepir/{client,doublepir}.rs; mirrors
 * sdk_tpu/doublepir/{client,scheme}.py). The shared matrices A1/A2 are
 * streamed from their fixed AES seeds, never materialized. */

import { printChecksum } from "./debug";
import { SEEDS_SHORT, deriveColSumsScaled, deriveMatVec } from "./derive";
import { Mat, SQUISH_DELTA, contract, gaussianMat, matmulU32, randomU32 } from "./matrix";
import { DbInfo, DpParams, reconstructElem } from "./params";
import { deserializeState, deserializeStates, serializeState, serializeStates } from "./serializer";

export interface DpQuery {
  state: Mat[]; // [secret1, secret2...]
  msg: Mat[]; // [query1, query2...]
}

export function queryIndices(i: number, params: DpParams, info: DbInfo): [number, number] {
  const idx = info.packing > 0 ? Math.floor(i / info.packing) : i;
  const i1 = Math.floor(idx / params.m) * (info.ne / info.x);
  const i2 = idx % params.m;
  return [i1, i2];
}

function padRows(m: Mat, multiple: number): Mat {
  if (m.rows % multiple === 0) return m;
  const pad = multiple - (m.rows % multiple);
  return Mat.vstack(m, Mat.zero(pad, m.cols));
}

export class DoublePirClient {
  params: DpParams;
  dbInfo: DbInfo;
  hint: Mat[] = [];
  private colSums2: Uint32Array | null = null;

  constructor(params: DpParams, info: DbInfo) {
    this.params = params;
    this.dbInfo = info;
    if (params.logq !== 32) throw new Error("only logq=32 supported");
  }

  static fromStrings(paramsStr: string, dbinfoStr: string): DoublePirClient {
    return new DoublePirClient(DpParams.fromString(paramsStr), DbInfo.fromString(dbinfoStr));
  }

  loadHint(hintBytes: Uint8Array): void {
    const [hint] = deserializeState(hintBytes, 0);
    this.hint = hint;
  }

  /** LWE encryptions of unit vectors for both levels (doublepir.rs:111-163). */
  async generateQuery(i: number): Promise<DpQuery> {
    const params = this.params;
    const info = this.dbInfo;
    const [i1, i2] = queryIndices(i, params, info);
    const extDelta = params.extDelta() >>> 0;

    const secret1 = randomU32(params.n, 1);
    const err1 = gaussianMat(params.m, 1);
    const q1vec = await deriveMatVec(SEEDS_SHORT[0], params.m, params.n, secret1.data);
    let query1 = new Mat(params.m, 1, q1vec);
    query1.addInPlace(err1);
    query1.data[i2] = (query1.data[i2] + extDelta) >>> 0;
    query1 = padRows(query1, SQUISH_DELTA);
    printChecksum("query1", query1.data); // reference doublepir.rs:136

    const state: Mat[] = [secret1];
    const msg: Mat[] = [query1];
    const lx = params.l / info.x;
    for (let j = 0; j < info.ne / info.x; j++) {
      const secret2 = gaussianMat(params.n, 1); // error-distribution secret
      const err2 = gaussianMat(lx, 1);
      const q2vec = await deriveMatVec(SEEDS_SHORT[1], lx, params.n, secret2.data);
      let query2 = new Mat(lx, 1, q2vec);
      query2.addInPlace(err2);
      query2.data[i1 + j] = (query2.data[i1 + j] + extDelta) >>> 0;
      query2 = padRows(query2, SQUISH_DELTA);
      printChecksum("query2", query2.data); // reference doublepir.rs:157
      state.push(secret2);
      msg.push(query2);
    }
    return { state, msg };
  }

  serializeQuery(q: DpQuery): { queryBytes: Uint8Array; clientData: Uint8Array } {
    return {
      queryBytes: serializeState(q.msg),
      clientData: serializeStates([q.state, q.msg]),
    };
  }

  /** Decrypt + round + recompose one entry (doublepir.rs:352-459). */
  async decodeResponse(
    response: Uint8Array,
    index: number,
    batchIndex: number,
    clientData: Uint8Array
  ): Promise<number> {
    const params = this.params;
    const info = this.dbInfo;
    const [answer] = deserializeState(response, 0);
    const qs = deserializeStates(clientData);
    if (qs.length !== 2) throw new Error("bad client data");
    const [clientState, queryMsg] = qs;
    const h2 = this.hint[0];
    const h1 = answer[0].copy(); // (delta*x, n)
    const secret1 = clientState[0];
    const ratio = Math.floor(params.p / 2);
    const q = 2n ** BigInt(params.logq);

    let sum1 = 0n;
    for (let r = 0; r < params.m; r++) sum1 += BigInt(queryMsg[0].data[r]);
    let val1 = (BigInt(ratio) * sum1) % q;
    val1 = (q - val1) % q;
    const lx = params.l / info.x;
    let sum2 = 0n;
    for (let r = 0; r < lx; r++) sum2 += BigInt(queryMsg[1].data[r]);
    let val2 = (BigInt(ratio) * sum2) % q;
    val2 = (q - val2) % q;
    const val2u32 = Number(val2 & 0xffffffffn) >>> 0;

    // shared-A2 adjustment: colSums[c] = ratio * sum_r A2[r][c], streamed
    if (this.colSums2 === null) {
      this.colSums2 = await deriveColSumsScaled(SEEDS_SHORT[1], lx, params.n, ratio);
    }
    for (let r = 0; r < h1.rows; r++) {
      for (let c = 0; c < h1.cols; c++) {
        const val3 = (0x100000000 - this.colSums2[c]) >>> 0; // (q - s) % q
        h1.data[r * h1.cols + c] = (h1.data[r * h1.cols + c] + val3) >>> 0;
      }
    }

    const delta = params.delta();
    const n = params.n;
    const offset = (info.ne / info.x) * 2 * batchIndex;
    const extDelta = params.extDelta();
    const vals: number[] = [];
    for (let k = 0; k < info.ne / info.x; k++) {
      const a2 = answer[1 + 2 * k + offset]; // (n*delta*x, 1)
      const h2m = answer[2 + 2 * k + offset].copy();
      h2m.addScalarInPlace(val2u32);
      const secret2 = clientState[1 + k];
      for (let j = 0; j < info.x; j++) {
        let state = a2.slice(j * n * delta, (j + 1) * n * delta);
        state.addScalarInPlace(val2u32);
        state = Mat.vstack(state, h2m.slice(j * delta, (j + 1) * delta));
        const hint = Mat.vstack(
          h2.slice(j * n * delta, (j + 1) * n * delta),
          h1.slice(j * delta, (j + 1) * delta)
        );
        const interm = matmulU32(hint, secret2);
        state.subInPlace(interm);
        // round_vec
        for (let r = 0; r < state.data.length; r++) {
          state.data[r] =
            Math.floor((state.data[r] + Math.floor(extDelta / 2)) / extDelta) % params.p;
        }
        const contracted = contract(state, params.p, delta); // (n+1, 1)
        let noised = (BigInt(contracted.data[n]) + val1) % q;
        let prodSum = 0n;
        for (let r = 0; r < n; r++) {
          prodSum += BigInt(Math.imul(secret1.data[r], contracted.data[r]) >>> 0);
        }
        noised = (((noised - prodSum) % q) + q) % q;
        vals.push(params.round(Number(noised)));
      }
    }
    return reconstructElem(vals, index, info);
  }

  // --- batch planning (reference client.rs:174-283) ---

  /** Partition DB rows into indices.length batches; one query per batch;
   * random filler index for empty batches. plan[b] is [index, target] or
   * null. */
  generateQueryPlan(indices: number[]): { plan: ([number, number] | null)[]; targets: number[] } {
    const params = this.params;
    const info = this.dbInfo;
    const batchNum = indices.length;
    const batchSz = Math.floor(params.l / batchNum);
    const packing = Math.max(info.packing, 1);
    const batchSzWords = batchSz * params.m * packing;
    const plan: ([number, number] | null)[] = new Array(batchNum).fill(null);

    for (const i of indices) {
      const dbElem = Math.floor(i / packing);
      const row = Math.floor(dbElem / params.m);
      const batch = Math.min(Math.floor(row / batchSz), batchNum - 1);
      if (plan[batch] === null) plan[batch] = [i, i];
    }

    const targets: number[] = [];
    for (let b = 0; b < batchNum; b++) {
      const entry = plan[b];
      if (entry !== null) targets.push(entry[1]);
      else {
        const rand = randomU32(1, 1).data[0] % batchSzWords;
        targets.push(batchSzWords * b + rand);
      }
    }
    return { plan, targets };
  }

  async generateQueryBatch(indices: number[]): Promise<{
    queryBytes: Uint8Array;
    clientDatas: Uint8Array[];
    plan: ([number, number] | null)[];
  }> {
    const { plan, targets } = this.generateQueryPlan(indices);
    const msgs: Mat[][] = [];
    const clientDatas: Uint8Array[] = [];
    for (const t of targets) {
      const q = await this.generateQuery(t);
      msgs.push(q.msg);
      clientDatas.push(serializeStates([q.state, q.msg]));
    }
    // the batch body is a Vec<State> of the per-batch query messages
    return { queryBytes: serializeStates(msgs), clientDatas, plan };
  }
}
