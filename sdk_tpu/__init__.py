"""sdk_tpu — TPU-native private-search engine (PIR).

A from-scratch reimplementation of the capabilities of the Blyss SDK
(blyssprivacy/sdk): a key-value store whose reads are private under
homomorphic encryption. Two schemes:

- Spiral: RLWE/GSW lattice FHE over R_q = Z_q[x]/(x^2048+1) with a
  2-prime CRT modulus (reference: lib/spiral-rs).
- DoublePIR: plain 32-bit integer LWE (reference: lib/doublepir).

The client / host plane is numpy; the server compute plane is JAX/XLA/Pallas
on TPU (see sdk_tpu.ops). Wire formats are byte-compatible with the
reference (seed-compressed serialization, ChaCha20-derived pseudorandom
rows, identical params JSON schema).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience exports mirroring the reference package surface
    (python/blyss/main.py: Client = BucketService)."""
    if name in ("Client", "BucketService"):
        from .clients.bucket_service import BucketService
        return BucketService
    if name == "Bucket":
        from .clients.bucket import Bucket
        return Bucket
    if name == "AsyncBucket":
        from .clients.async_bucket import AsyncBucket
        return AsyncBucket
    if name == "connect_local":
        from .clients.bucket_service import connect_local
        return connect_local
    raise AttributeError(name)
