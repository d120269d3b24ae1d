"""DoublePIR: plain 32-bit integer-LWE PIR (reference: lib/doublepir).

All ciphertext arithmetic is mod 2^32 — native wrapping uint32 — which maps
directly onto TPU integer lanes. The host plane (numpy) here is the oracle
and the client; the server's big matmuls (hint build DB*A1, online answer
matvecs) run on TPU via sdk_tpu.doublepir.jax_kernels.
"""

from .params import Params, pick_params
from .database import Db, DbInfo
from . import scheme

__all__ = ["Params", "pick_params", "Db", "DbInfo", "scheme"]
