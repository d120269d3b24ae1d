"""ctypes wrapper over the native C++ Spiral client (libspiralclient.so).

The native client (sdk_tpu/native/spiral/) is the third client stack next to
the Python (sdk_tpu/client.py) and TypeScript (js/src/crypto) SDKs, mirroring
the reference's Rust client (lib/spiral-rs/src/client.rs, lib/blyss-rs). For
identical params + seeds it produces byte-identical public-parameter and
query serializations and identical decoded items — pinned by
tests/test_native_client.py against the Python client.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_LIB = None
_TRIED = False

_DIR = os.path.dirname(__file__)


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_DIR, "libspiralclient.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _DIR, "libspiralclient.so"],
                           capture_output=True, timeout=300, check=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.spiral_client_new.argtypes = [ctypes.c_char_p]
    lib.spiral_client_new.restype = ctypes.c_void_p
    lib.spiral_client_free.argtypes = [ctypes.c_void_p]
    lib.spiral_buffer_free.argtypes = [ctypes.c_void_p]
    lib.spiral_generate_secret_keys.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.spiral_generate_keys.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_size_t)]
    lib.spiral_generate_keys.restype = ctypes.c_void_p
    lib.spiral_generate_query.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_size_t)]
    lib.spiral_generate_query.restype = ctypes.c_void_p
    lib.spiral_decode_response.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_size_t)]
    lib.spiral_decode_response.restype = ctypes.c_void_p
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def cli_path() -> str | None:
    """Path to the native CLI binary, building it if needed."""
    exe = os.path.join(_DIR, "spiral_cli")
    if not os.path.exists(exe):
        try:
            subprocess.run(["make", "-C", _DIR, "spiral_cli"],
                           capture_output=True, timeout=300, check=True)
        except Exception:
            return None
    return exe if os.path.exists(exe) else None


def _take(lib, ptr, n) -> bytes:
    if not ptr:
        raise RuntimeError("native spiral client call failed")
    try:
        return ctypes.string_at(ptr, n.value)
    finally:
        lib.spiral_buffer_free(ptr)


class NativeSpiralClient:
    """Handle-owning wrapper; one instance per (params, secret key)."""

    def __init__(self, params_json: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("libspiralclient.so unavailable")
        self._lib = lib
        self._h = lib.spiral_client_new(params_json.encode())
        if not self._h:
            raise ValueError("bad params JSON")

    def close(self):
        if self._h:
            self._lib.spiral_client_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def generate_keys(self, sk_seed: bytes, noise_seed: bytes,
                      pp_seed: bytes) -> bytes:
        assert len(sk_seed) == len(noise_seed) == len(pp_seed) == 32
        n = ctypes.c_size_t()
        ptr = self._lib.spiral_generate_keys(
            self._h, sk_seed, noise_seed, pp_seed, ctypes.byref(n))
        return _take(self._lib, ptr, n)

    def generate_secret_keys(self, sk_seed: bytes) -> None:
        assert len(sk_seed) == 32
        self._lib.spiral_generate_secret_keys(self._h, sk_seed)

    def generate_query(self, idx: int, noise_seed: bytes,
                       query_seed: bytes) -> bytes:
        assert len(noise_seed) == len(query_seed) == 32
        n = ctypes.c_size_t()
        ptr = self._lib.spiral_generate_query(
            self._h, idx, noise_seed, query_seed, ctypes.byref(n))
        return _take(self._lib, ptr, n)

    def decode_response(self, data: bytes) -> bytes:
        n = ctypes.c_size_t()
        ptr = self._lib.spiral_decode_response(
            self._h, data, len(data), ctypes.byref(n))
        return _take(self._lib, ptr, n)
