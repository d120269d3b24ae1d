/** Hermetic e2e: spawn the Python HTTP server (sdk_tpu.server.http) and
 * drive the TS SDK against it — the reference's e2e-tests/main.ts pattern
 * (spawn server binary, wait for "Listening on", run the SDK, assert
 * byte-exact round trips). Run with:  npm run e2e
 *
 * This is the cross-language wire-compatibility proof: TS client crypto +
 * serialization against the Python/TPU server plane. */

import { spawn, ChildProcess } from "child_process";
import { mkdtempSync, writeFileSync } from "fs";
import { tmpdir } from "os";
import { join } from "path";

import { connectLocal } from "../src/bucket/bucket_service";

const FAST_PARAMS = {
  n: 2,
  nu_1: 6,
  nu_2: 2,
  p: 256,
  q2_bits: 20,
  t_gsw: 8,
  t_conv: 4,
  t_exp_left: 8,
  t_exp_right: 8,
  instances: 1,
  db_item_size: 8192,
};

function startServer(port: number, paramsFile: string): Promise<ChildProcess> {
  return new Promise((resolve, reject) => {
    const proc = spawn(
      process.env.PYTHON ?? "python3",
      ["-m", "sdk_tpu.server.http", String(port), paramsFile],
      {
        cwd: join(__dirname, "..", ".."),
        env: { ...process.env, JAX_PLATFORMS: "cpu", SDK_TPU_FORCE_CPU: "1" },
        stdio: ["ignore", "pipe", "inherit"],
      }
    );
    const timer = setTimeout(() => reject(new Error("server did not start")), 300000);
    proc.stdout!.on("data", (d: Buffer) => {
      if (d.toString().includes("Listening on")) {
        clearTimeout(timer);
        resolve(proc);
      }
    });
    proc.on("exit", (code) => reject(new Error(`server exited early: ${code}`)));
  });
}

function assertEq<T>(got: T, want: T, what: string): void {
  const g = JSON.stringify(got);
  const w = JSON.stringify(want);
  if (g !== w) throw new Error(`${what}: ${g} != ${w}`);
  console.log(`ok: ${what}`);
}

async function main(): Promise<void> {
  const dir = mkdtempSync(join(tmpdir(), "sdk-tpu-e2e-"));
  const paramsFile = join(dir, "params.json");
  writeFileSync(paramsFile, JSON.stringify(FAST_PARAMS));
  const port = 18000 + Math.floor(Math.random() * 2000);
  console.log(`starting server on :${port} ...`);
  const proc = await startServer(port, paramsFile);
  try {
    const bucket = await connectLocal(port);
    const enc = new TextEncoder();
    const dec = new TextDecoder();

    await bucket.write({
      "key-one": enc.encode("value one"),
      "key-two": enc.encode("value two, somewhat longer"),
    });
    const got = await bucket.privateRead(["key-one", "key-two", "absent-key"]);
    assertEq(dec.decode(got[0]!), "value one", "privateRead key-one");
    assertEq(dec.decode(got[1]!), "value two, somewhat longer", "privateRead key-two");
    assertEq(got[2], null, "privateRead absent-key");

    // delete + read-after-delete
    await bucket.deleteKey("key-one");
    const afterDelete = await bucket.privateRead(["key-one", "key-two"]);
    assertEq(afterDelete[0], null, "read-after-delete");
    assertEq(dec.decode(afterDelete[1]!), "value two, somewhat longer", "survivor");

    // bloom-prefiltered intersection
    const hits = await bucket.privateIntersect(["key-two", "nope-1", "nope-2"]);
    assertEq(hits, ["key-two"], "privateIntersect");

    // rename + clear
    await bucket.rename("renamed-bucket");
    const info = await bucket.info();
    assertEq(info["name"], "renamed-bucket", "rename");
    await bucket.clearEntireBucket();
    const cleared = await bucket.privateRead(["key-two"]);
    assertEq(cleared[0], null, "read-after-clear");

    console.log("e2e: ALL PASS");
  } finally {
    proc.kill("SIGTERM");
  }
}

main().catch((e) => {
  console.error(e);
  process.exit(1);
});
