/** High-level Bucket API (reference js/bucket/bucket.ts): write,
 * privateRead, privateIntersect, checkInclusion, deleteKey, clear, destroy,
 * rename, setup. All crypto is in-process TypeScript (no wasm bridge); the
 * wire formats match the reference byte-for-byte, so this client works
 * against sdk_tpu.server.http and the reference Rust server alike. */

import { Api } from "../client/api";
import { getRandomSeed, seedFromString } from "../client/seed";
import { SpiralClient } from "../crypto/client";
import { Params, paramsFromJsonObj } from "../crypto/params";
import { base64ToBytes, bytesToBase64 } from "../data/base64";
import { BloomFilter, bloomHash } from "../data/bloom";
import { bz2Decompress } from "../data/bz2";
import { extractResult, rowFromKey } from "../data/kv";
import { concatBytes } from "../data/serializer";
import { DoublePirClient } from "../doublepir/client";

const MAX_PAYLOAD = 5 * 2 ** 20; // 5 MiB write chunks (reference bucket.py:66)

export class Bucket {
  name: string;
  scheme: "spiral" | "doublepir" = "spiral";
  params!: Params;
  metadata: Record<string, unknown> = {};

  private api: Api;
  private secretSeed: string;
  private client!: SpiralClient;
  private publicUuid: string | null = null;
  private ppBytes: Uint8Array | null = null;

  private dp: DoublePirClient | null = null;
  private bloomK = 8;
  private bloomLog2m = 0;
  private dpHintLoaded = false;

  private constructor(api: Api, name: string, secretSeed?: string) {
    this.api = api;
    this.name = name;
    this.secretSeed = secretSeed ?? getRandomSeed();
  }

  static async initialize(api: Api, name = "", secretSeed?: string): Promise<Bucket> {
    const b = new Bucket(api, name, secretSeed);
    b.metadata = await api.meta(name);
    const schemeObj = b.metadata["pir_scheme"] as Record<string, unknown>;
    // scheme switch from /meta (reference bucket.ts:246-266)
    if (schemeObj["scheme"] === "doublepir") {
      b.scheme = "doublepir";
      b.dp = DoublePirClient.fromStrings(
        schemeObj["params"] as string,
        schemeObj["dbinfo"] as string
      );
      b.bloomK = Number(schemeObj["bloom_k"] ?? 8);
      b.bloomLog2m = Number(schemeObj["bloom_log2m"]);
      return b;
    }
    b.scheme = "spiral";
    b.params = paramsFromJsonObj(schemeObj);
    b.client = new SpiralClient(b.params);
    b.client.generateSecretKeysFromSeed(seedFromString(b.secretSeed));
    return b;
  }

  /**
   * Export this bucket identity as a 32-byte base64 seed (reference
   * bucket.ts:483-486). Portable between this repo's TypeScript and
   * Python clients ONLY: the Rust reference's key shuffle consumes
   * randomness differently (client.rs:130-144), so seeds are NOT
   * interchangeable with the Rust SDK (public wire formats are
   * unaffected — see README "Compatibility").
   */
  toSecretSeed(): string {
    return this.secretSeed;
  }

  getRow(key: string): number {
    return rowFromKey(this.params.numItems(), key);
  }

  async info(): Promise<Record<string, unknown>> {
    return this.api.meta(this.name);
  }

  // --- setup (reference bucket.ts:298-308) ---

  async setup(): Promise<void> {
    const pp = this.client.generateKeysFromSeed(seedFromString(this.secretSeed));
    this.ppBytes = pp.serialize(this.params);
    if (this.params.expandQueries) {
      this.publicUuid = await this.api.setup(this.name, this.ppBytes);
    } else {
      this.publicUuid = "direct";
    }
  }

  private async checkUuid(): Promise<boolean> {
    if (this.publicUuid === null) return false;
    if (!this.params.expandQueries) return true;
    return this.api.check(this.publicUuid);
  }

  // --- writes (reference bucket.ts:332-352; 5 MiB chunking, row-grouped) ---

  async write(kvPairs: Record<string, Uint8Array | null>): Promise<void> {
    for (const chunk of this.splitIntoJsonChunks(kvPairs)) {
      await this.api.write(this.name, chunk);
    }
  }

  async deleteKey(keys: string | string[]): Promise<void> {
    const list = typeof keys === "string" ? [keys] : keys;
    const body: Record<string, string | null> = {};
    for (const k of list) body[k] = null;
    await this.api.write(this.name, body);
  }

  private splitIntoJsonChunks(
    kvPairs: Record<string, Uint8Array | null>
  ): Record<string, string | null>[] {
    const keysByIndex = new Map<number, string[]>();
    for (const k of Object.keys(kvPairs)) {
      const row = this.getRow(k);
      const arr = keysByIndex.get(row) ?? [];
      arr.push(k);
      keysByIndex.set(row, arr);
    }
    const chunks: Record<string, string | null>[] = [];
    let current: Record<string, string | null> = {};
    let currentSize = 0;
    for (const i of [...keysByIndex.keys()].sort((a, b) => a - b)) {
      const row: Record<string, string | null> = {};
      let rowSize = 0;
      for (const key of keysByIndex.get(i) as string[]) {
        const vi = kvPairs[key];
        const v = vi === null ? null : bytesToBase64(vi);
        row[key] = v;
        rowSize += 16 + key.length + (v === null ? 4 : v.length);
      }
      if (currentSize + rowSize > MAX_PAYLOAD && Object.keys(current).length) {
        chunks.push(current);
        current = row;
        currentSize = rowSize;
      } else {
        Object.assign(current, row);
        currentSize += rowSize;
      }
    }
    if (Object.keys(current).length) chunks.push(current);
    return chunks;
  }

  // --- private reads (reference bucket.ts:151-178, 389-410) ---

  async privateRead(keys: string[]): Promise<(Uint8Array | null)[]> {
    const rows = await this.privateReadRow(keys.map((k) => this.getRow(k)));
    return keys.map((key, i) => {
      const row = rows[i];
      if (row === null) return null;
      return extractResult(key, row);
    });
  }

  async privateReadRow(rowIndices: number[]): Promise<(Uint8Array | null)[]> {
    if (this.publicUuid === null || !(await this.checkUuid())) await this.setup();
    const queries = rowIndices.map((i) => this.generateQuery(i));
    const raw = await this.api.privateRead(this.name, queries);
    return raw.map((r) => (r ? this.decodeResultRow(r) : null));
  }

  private generateQuery(rowIdx: number): Uint8Array {
    const q = this.client.generateQuery(rowIdx).serialize(this.params);
    if (this.params.expandQueries) {
      if (this.publicUuid === null) throw new Error("not set up");
      return concatBytes([new TextEncoder().encode(this.publicUuid), q]);
    }
    if (this.ppBytes === null) throw new Error("not set up");
    return concatBytes([this.ppBytes, q]);
  }

  private decodeResultRow(resultRow: Uint8Array): Uint8Array | null {
    try {
      const decrypted = this.client.decodeResponse(resultRow);
      return bz2Decompress(decrypted);
    } catch {
      return null;
    }
  }

  // --- bloom-prefiltered private intersection (reference bucket.ts:413-432) ---

  async privateIntersect(keys: string[]): Promise<string[]> {
    const r = (await this.api.get(this.api.url(this.name, "/bloom"))) as { bloom: string };
    const bf = BloomFilter.fromBytes(base64ToBytes(r.bloom));
    const candidates = keys.filter((k) => bf.lookup(k));
    const found = await this.privateRead(candidates);
    return candidates.filter((_, i) => found[i] !== null);
  }

  // --- checklist membership (reference bucket.ts:202-232, 466-470) ---

  private async loadDpHint(): Promise<void> {
    if (this.dpHintLoaded || this.dp === null) return;
    const schemeObj = this.metadata["pir_scheme"] as Record<string, unknown>;
    const hintBytes = Number(schemeObj["hint_bytes"] ?? 0);
    const chunkBytes = Number(schemeObj["hint_chunk_bytes"] ?? 0);
    if (hintBytes && chunkBytes && hintBytes > chunkBytes) {
      // chunked raw download (reference hint-CDN pattern)
      const n = Math.ceil(hintBytes / chunkBytes);
      const parts: Uint8Array[] = [];
      for (let i = 0; i < n; i++) {
        parts.push(await this.api.getRaw(this.api.url(this.name, `/hint/chunk/${i}`)));
      }
      this.dp.loadHint(concatBytes(parts));
    } else {
      const r = (await this.api.get(this.api.url(this.name, "/hint"))) as { hint: string };
      this.dp.loadHint(base64ToBytes(r.hint));
    }
    this.dpHintLoaded = true;
  }

  /** Private membership check via batched DoublePIR bloom-bit reads:
   * >= 5 of k bits set. */
  async checkInclusion(key: string): Promise<boolean> {
    if (this.scheme !== "doublepir" || this.dp === null) {
      throw new Error("cannot checkInclusion on a spiral bucket");
    }
    await this.loadDpHint();
    const indices: number[] = [];
    for (let i = 0; i < this.bloomK; i++) indices.push(bloomHash(key, i, this.bloomLog2m));
    const { queryBytes, clientDatas, plan } = await this.dp.generateQueryBatch(indices);
    const raw = (await this.api.privateRead(this.name, [queryBytes]))[0];
    if (raw === null) throw new Error("no answer");
    let count = 0;
    for (let b = 0; b < plan.length; b++) {
      const entry = plan[b];
      if (entry === null) continue;
      const bit = await this.dp.decodeResponse(raw, entry[0], b, clientDatas[b]);
      if (bit === 0) return false;
      count++;
    }
    return count >= 5;
  }

  // --- admin (reference bucket.ts destroy/clear/rename) ---

  async clearEntireBucket(): Promise<void> {
    await this.api.post(this.api.url(this.name, "/clear"), "{}");
  }

  async destroyEntireBucket(): Promise<void> {
    await this.api.post(this.api.url(this.name, "/destroy"), "");
  }

  async rename(newName: string): Promise<void> {
    await this.api.post(this.api.url(this.name, "/modify"), JSON.stringify({ name: newName }));
    this.name = newName;
  }
}
