/** Node example against a remote deployment (reference examples/node):
 * point SDK_TPU_ENDPOINT at any sdk_tpu DCN frontend or HTTP server, e.g.
 *
 *   python -m sdk_tpu.server.http 8008                 # or a remote host
 *   SDK_TPU_ENDPOINT=http://my-host:8008 npx ts-node examples/node/main.ts
 */

import { Client } from "../../js/src/bucket/bucket_service";

async function main() {
  const endpoint = process.env.SDK_TPU_ENDPOINT ?? "http://localhost:8008";
  const apiKey = process.env.SDK_TPU_API_KEY ?? "";
  const client = new Client(apiKey, endpoint);

  // Connect to the bucket served at the endpoint
  const bucket = await client.connect("state-capitals");
  const enc = new TextEncoder();
  const dec = new TextDecoder();

  await bucket.write({
    Ohio: enc.encode("Columbus"),
    California: enc.encode("Sacramento"),
    Washington: enc.encode("Olympia"),
  });

  // This is a completely *private* query:
  // the server *cannot* learn that you looked up "California"!
  const [capital] = await bucket.privateRead(["California"]);
  console.log(`Got capital: ${dec.decode(capital!)}`);
}

main();
