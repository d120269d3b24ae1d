"""Native (C++) components, loaded via ctypes with pure-numpy fallbacks.

Currently: the bit-packed field codec used by response encode / decode
(the host-side hot path of the wire formats). Build with
`make -C sdk_tpu/native`; callers use sdk_tpu.native.bitpack_native which
transparently falls back to sdk_tpu.bitpack when the .so is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(os.path.dirname(__file__), "libsdkbitpack.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.dirname(__file__)],
                           capture_output=True, timeout=120, check=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.read_fields.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint32,
            ctypes.c_uint64, ctypes.c_void_p]
        lib.write_fields.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint32,
            ctypes.c_uint64, ctypes.c_void_p]
        lib.poly_to_bytes.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint64, ctypes.c_uint32, ctypes.c_void_p]
        lib.rescale.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint64, ctypes.c_void_p]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def read_fields(data: bytes, bit_offs: int, num_bits: int, count: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        from ..bitpack import read_fields as np_read
        return np_read(data, bit_offs, num_bits, count)
    buf = np.frombuffer(data, dtype=np.uint8)
    # the C kernel reads 8-byte windows; pad the tail
    need = (bit_offs + num_bits * count + 7) // 8 + 8
    if len(buf) < need:
        buf = np.concatenate([buf, np.zeros(need - len(buf), dtype=np.uint8)])
    buf = np.ascontiguousarray(buf)
    out = np.empty(count, dtype=np.uint64)
    lib.read_fields(buf.ctypes.data, bit_offs, num_bits, count,
                    out.ctypes.data)
    return out


def rescale_arr(a: np.ndarray, inp_mod: int, out_mod: int) -> np.ndarray:
    """Exact modulus-switch rescale via the C++ __int128 kernel; falls back
    to sdk_tpu.arith.rescale_arr (exact but slow for 56-bit inputs)."""
    lib = _load()
    if lib is None:
        from ..arith import rescale_arr as np_rescale
        return np_rescale(a, inp_mod, out_mod)
    flat = np.ascontiguousarray(a.reshape(-1).astype(np.uint64))
    out = np.empty_like(flat)
    lib.rescale(flat.ctypes.data, len(flat), inp_mod, out_mod, out.ctypes.data)
    return out.reshape(a.shape)


def write_fields(data: bytearray, vals: np.ndarray, bit_offs: int,
                 num_bits: int) -> int:
    lib = _load()
    vals = np.ascontiguousarray(np.atleast_1d(vals).astype(np.uint64))
    if lib is None:
        from ..bitpack import write_fields as np_write
        return np_write(data, vals, bit_offs, num_bits)
    # pad an 8-byte scratch tail for the read-modify-write window
    buf = np.frombuffer(bytes(data) + bytes(8), dtype=np.uint8).copy()
    lib.write_fields(buf.ctypes.data, bit_offs, num_bits, len(vals),
                     vals.ctypes.data)
    data[:] = buf[: len(data)].tobytes()
    return bit_offs + num_bits * len(vals)
