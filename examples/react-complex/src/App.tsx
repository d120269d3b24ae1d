/** Private contact discovery (reference examples/react-complex concept,
 * rebuilt on the sdk_tpu TS SDK): a pool of simulated users registers
 * phone->handle mappings in a bucket; "your" device then discovers which
 * of your contacts are registered via Bucket.privateIntersect — the server
 * never learns whose address book you hold.
 *
 * Run a local server first:  python -m sdk_tpu.server.http 8008
 */
import React from "react";
import { Bucket, Client } from "../../../js/src";

interface User {
  name: string;
  handle: string;
  phone: string;
  contacts: string[];
}

const FIRST = "Joe,Ali,Alisa,Belen,Jakob,Cade,Brett,Trent,Silas".split(",");
const LAST = "Brown,Jones,Miller,Davis,Garcia,Rodriguez".split(",");

function randomPhone(): string {
  const d = () => Math.floor(Math.random() * 10);
  return `${d()}${d()}${d()}-${d()}${d()}${d()}-${d()}${d()}${d()}${d()}`;
}

function randomUser(pool: string[]): User {
  const name = `${FIRST[Math.floor(Math.random() * FIRST.length)]} ${
    LAST[Math.floor(Math.random() * LAST.length)]}`;
  const handle = "@" + name.toLowerCase().replace(" ", "") +
    Math.floor(Math.random() * 100);
  const contacts = Array.from(new Set(
    pool.filter(() => Math.random() < 0.4).slice(0, 5)));
  return { name, handle, phone: randomPhone(), contacts };
}

async function connect(): Promise<Bucket> {
  const client = new Client("", "http://localhost:8008");
  return client.connect("contact-demo");
}

export default function App() {
  const [bucket, setBucket] = React.useState<Bucket | undefined>();
  const [users, setUsers] = React.useState<User[]>([]);
  const [me, setMe] = React.useState<User | undefined>();
  const [found, setFound] = React.useState<string[] | undefined>();
  const [busy, setBusy] = React.useState(false);

  async function populate() {
    setBusy(true);
    const b = bucket ?? (await connect());
    setBucket(b);
    const phones: string[] = [];
    const pool: User[] = [];
    for (let i = 0; i < 12; i++) {
      const u = randomUser(phones);
      phones.push(u.phone);
      pool.push(u);
    }
    const enc = new TextEncoder();
    const kv: Record<string, Uint8Array> = {};
    for (const u of pool) kv[u.phone] = enc.encode(u.handle);
    await b.write(kv);
    setUsers(pool);
    setMe(randomUser(phones));
    setFound(undefined);
    setBusy(false);
  }

  async function discover() {
    if (!bucket || !me) return;
    setBusy(true);
    // the server processes the intersection without learning the contacts
    setFound(await bucket.privateIntersect(me.contacts));
    setBusy(false);
  }

  return (
    <div style={{ fontFamily: "sans-serif", margin: 24 }}>
      <h1>Private contact discovery</h1>
      <button onClick={populate} disabled={busy}>
        1. Register {12} random users
      </button>
      <button onClick={discover} disabled={busy || !me}>
        2. Privately intersect my contacts
      </button>
      {me && (
        <p>
          You are <b>{me.name}</b> with {me.contacts.length} contacts.
        </p>
      )}
      {found && (
        <p>
          Registered contacts found (server learned nothing):{" "}
          <b>{found.join(", ") || "none"}</b>
        </p>
      )}
      <ul>
        {users.map(u => (
          <li key={u.phone}>
            {u.name} ({u.handle}) — {u.phone}
          </li>
        ))}
      </ul>
    </div>
  );
}
