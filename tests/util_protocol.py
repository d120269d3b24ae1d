"""Shared test helper: a full in-process protocol read against a
SpiralKvServer (setup -> query -> serve -> decode -> row decompress ->
key extraction), the offline equivalent of the HTTP client flow in
sdk_tpu.clients.bucket."""

import bz2

from sdk_tpu.client import Client, reframe_decoded_row
from sdk_tpu.kv.key_value import extract_result, row_from_key


def read_via_protocol(srv, key: str) -> bytes:
    """Private-read `key` from a SpiralKvServer with a fresh client.
    Raises KeyError if the key is absent."""
    params = srv.params
    client = Client(params)
    pp = client.generate_keys()
    idx = row_from_key(params.num_items(), key)
    qbytes = client.generate_query(idx).serialize(params)
    if params.expand_queries:
        uid = srv.setup_raw(pp.serialize(params))
        resp = srv.private_read_one(uid.encode() + qbytes)
    else:
        resp = srv.private_read_one(pp.serialize(params) + qbytes)
    row = reframe_decoded_row(params, client.decode_response(resp))
    payload = bz2.BZ2Decompressor().decompress(row)
    return extract_result(key, payload)
