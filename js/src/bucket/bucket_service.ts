/** Service entry point (reference js/bucket/bucket_service.ts): connect to
 * hosted buckets or a local single-bucket server. */

import { Api } from "../client/api";
import { Bucket } from "./bucket";

export const DEFAULT_ENDPOINT = "https://beta.api.blyss.dev";

export class Client {
  private api: Api;

  constructor(apiKey = "", serviceEndpoint: string = DEFAULT_ENDPOINT) {
    this.api = new Api(apiKey, serviceEndpoint);
  }

  async connect(bucketName = "", secretSeed?: string): Promise<Bucket> {
    return Bucket.initialize(this.api, bucketName, secretSeed);
  }

  async exists(bucketName = ""): Promise<boolean> {
    return this.api.exists(bucketName);
  }
}

/** Connect to a local single-bucket server (sdk_tpu.server.http or the
 * reference Rust server) on localhost. */
export async function connectLocal(port: number, secretSeed?: string): Promise<Bucket> {
  const api = new Api("", `http://localhost:${port}`);
  return Bucket.initialize(api, "", secretSeed);
}
