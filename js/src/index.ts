/** blyss-compatible TypeScript SDK for the sdk_tpu framework — pure TS (no
 * wasm bridge); wire-compatible with the reference protocol. */

export { Bucket } from "./bucket/bucket";
export { Client, connectLocal, DEFAULT_ENDPOINT } from "./bucket/bucket_service";
export { Api, ApiError } from "./client/api";
export { getRandomSeed, seedFromString, stringFromSeed } from "./client/seed";
export { SpiralClient, PublicParameters, Query, reorientRegCiphertexts } from "./crypto/client";
export { Params, paramsFromJson, paramsFromJsonObj, Q2_VALUES } from "./crypto/params";
export { ChaCha20Rng } from "./crypto/chacha20";
export { DiscreteGaussian } from "./crypto/gaussian";
export { BloomFilter, bloomHash } from "./data/bloom";
export { bz2Decompress } from "./data/bz2";
export { rowFromKey, extractResult } from "./data/kv";
export { varintEncode, varintDecode } from "./data/varint";
export { serializeChunks, deserializeChunks, wrapKeyVal, unwrapKeyVal } from "./data/serializer";
export { bytesToBase64, base64ToBytes } from "./data/base64";
export { DoublePirClient } from "./doublepir/client";
export { DpParams, DbInfo } from "./doublepir/params";
