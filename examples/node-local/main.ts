/** Node example against a local server (reference examples/node-local):
 *
 *   python -m sdk_tpu.server.http 8008          # terminal 1
 *   npx ts-node examples/node-local/main.ts     # terminal 2 (from repo root)
 */

import { connectLocal } from "../../js/src/bucket/bucket_service";

async function main() {
  const bucket = await connectLocal(8008);
  const enc = new TextEncoder();
  const dec = new TextDecoder();

  // Write some data to it
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
