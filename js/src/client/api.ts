/** HTTP API client (fetch; works in node >= 18 and browsers) — the
 * transport layer under Bucket (reference js/client/api.ts; mirrors
 * sdk_tpu/clients/api.py). Supports both URL shapes: local single-bucket
 * server (bare paths) and hosted multi-bucket service (/<bucket>/...). */

import { base64ToBytes, bytesToBase64 } from "../data/base64";

export const META_PATH = "/meta";
export const SETUP_PATH = "/setup";
export const WRITE_PATH = "/write";
export const READ_PATH = "/private-read";
export const CHECK_PATH = "/check";
export const BLOOM_PATH = "/bloom";

/** Bodies above this go via the presigned-upload flow instead of inline
 * JSON (APIGW 6 MB limit, base64 factor + 5% margin — reference
 * python/blyss/api.py:33). */
export const APIGW_MAX_SIZE = Math.floor(((6e6 / 4) * 3) * 0.95);

export class ApiError extends Error {
  constructor(
    message: string,
    public code: number
  ) {
    super(`API error ${code}: ${message}`);
  }
}

export class Api {
  endpoint: string;
  apiKey: string;

  constructor(apiKey = "", serviceEndpoint = "") {
    this.apiKey = apiKey;
    this.endpoint = serviceEndpoint.replace(/\/+$/, "");
  }

  private headers(): Record<string, string> {
    const h: Record<string, string> = { "Content-Type": "application/json" };
    if (this.apiKey) h["x-api-key"] = this.apiKey;
    return h;
  }

  url(bucketName: string, path: string): string {
    return bucketName ? `${this.endpoint}/${bucketName}${path}` : this.endpoint + path;
  }

  async getRaw(url: string): Promise<Uint8Array> {
    const r = await fetch(url, { headers: this.headers() });
    if (!r.ok) throw new ApiError(await r.text(), r.status);
    return new Uint8Array(await r.arrayBuffer());
  }

  async get(url: string): Promise<unknown> {
    const r = await fetch(url, { headers: this.headers() });
    if (!r.ok) throw new ApiError(await r.text(), r.status);
    return r.json();
  }

  async post(url: string, data: Uint8Array | string): Promise<unknown> {
    const body = typeof data === "string" ? data : (data as BodyInit);
    const r = await fetch(url, { method: "POST", headers: this.headers(), body });
    if (!r.ok) throw new ApiError(await r.text(), r.status);
    const text = await r.text();
    return text ? JSON.parse(text) : null;
  }

  // --- routes ---

  async meta(bucketName = ""): Promise<Record<string, unknown>> {
    return (await this.get(this.url(bucketName, META_PATH))) as Record<string, unknown>;
  }

  async exists(bucketName = ""): Promise<boolean> {
    try {
      await this.meta(bucketName);
      return true;
    } catch {
      return false;
    }
  }

  async check(uuid: string): Promise<boolean> {
    try {
      const r = (await this.get(`${this.endpoint}/${uuid}${CHECK_PATH}`)) as {
        found?: boolean;
      };
      return r.found ?? true;
    } catch {
      return false;
    }
  }

  /** multipart/form-data POST — the presigned-upload payload leg
   * (reference js/client/api.ts:150-178 postFormData). */
  private async postFormData(
    url: string,
    fields: Record<string, string>,
    data: Uint8Array
  ): Promise<void> {
    const form = new FormData();
    for (const [k, v] of Object.entries(fields)) form.append(k, v);
    form.append("file", new Blob([data as BlobPart]), "file");
    const headers: Record<string, string> = {};
    if (this.apiKey) headers["x-api-key"] = this.apiKey;
    const r = await fetch(url, { method: "POST", headers, body: form });
    if (!r.ok) throw new ApiError(await r.text(), r.status);
  }

  /** Large-payload setup: prelim {"length": N} -> presigned URL ->
   * multipart upload (reference api.rs:149-186, js api.ts:303-324). */
  async setupPresigned(bucketName: string, data: Uint8Array): Promise<string> {
    const r = (await this.post(
      this.url(bucketName, SETUP_PATH),
      JSON.stringify({ length: data.length })
    )) as { url: string; fields?: Record<string, string>; uuid: string };
    let url = r.url;
    if (url.startsWith("/")) url = this.endpoint + url; // local emulation
    await this.postFormData(url, r.fields ?? {}, data);
    return r.uuid;
  }

  async setup(bucketName: string, data: Uint8Array): Promise<string> {
    if (data.length > APIGW_MAX_SIZE) return this.setupPresigned(bucketName, data);
    const r = (await this.post(
      this.url(bucketName, SETUP_PATH),
      JSON.stringify(bytesToBase64(data))
    )) as { uuid: string };
    return r.uuid;
  }

  async write(bucketName: string, kvJson: Record<string, string | null>): Promise<unknown> {
    return this.post(this.url(bucketName, WRITE_PATH), JSON.stringify(kvJson));
  }

  async privateRead(bucketName: string, queries: Uint8Array[]): Promise<(Uint8Array | null)[]> {
    const body = JSON.stringify(queries.map(bytesToBase64));
    const r = (await this.post(this.url(bucketName, READ_PATH), body)) as (string | null)[];
    return r.map((x) => (x ? base64ToBytes(x) : null));
  }
}
