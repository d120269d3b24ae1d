"""DoublePIR cross-implementation checksum fingerprints.

Pins the named XOR checksums (sdk_tpu.doublepir.debug, reference
matrix.rs:176-196 / util/checksum.rs) for the SAME planted scenario the TS
fixtures carry: js/tests/fixtures/doublepir.json bakes the Python-computed
values and js/tests/doublepir.test.ts recomputes them from the
deserialized matrices — identical checksums from both client codebases,
the divergence-hunting contract.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from sdk_tpu.doublepir import debug as dpdebug
from sdk_tpu.doublepir import scheme as dp_scheme
from sdk_tpu.doublepir.database import Db
from sdk_tpu.doublepir.debug import checksum_u32, checksum_u8
from sdk_tpu.doublepir.params import Params as DpParams

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "js", "tests", "fixtures", "doublepir.json")


def _fixture_scenario():
    """The exact planted case tools/gen_ts_fixtures.py serializes."""
    dparams = DpParams(n=32, sigma=6.4, l=12, m=12, logq=32, p=929)
    rng_np = np.random.default_rng(11)
    nbits = dparams.l * dparams.m
    bits = rng_np.integers(0, 2, nbits, dtype=np.uint64)
    db = Db.from_entries(nbits, 1, dparams, [int(b) for b in bits])
    shared = dp_scheme.init(db.info, dparams)
    server_state, hint = dp_scheme.setup(db, shared, dparams)
    state, msg = dp_scheme.query(17, shared, dparams, db.info,
                                 np.random.default_rng(3))
    answer = dp_scheme.answer(db, [msg], server_state, dparams)
    return msg, hint, answer


def test_checksums_match_ts_fixture():
    with open(FIXTURE) as f:
        fix = json.load(f)
    assert "checksums" in fix, \
        "fixture stale — run tools/gen_ts_fixtures.py"
    msg, hint, answer = _fixture_scenario()
    got = {
        "query1": checksum_u32(msg[0]),
        "query2": checksum_u32(msg[1]),
        "hint_h2": checksum_u32(hint[0]),
        "answer_h1": checksum_u32(answer[0]),
        "answer_a2": checksum_u32(answer[1]),
        "answer_h2": checksum_u32(answer[2]),
    }
    assert got == fix["checksums"]


def test_checksum_primitives():
    assert checksum_u8(b"") == 0
    assert checksum_u8(bytes([0x5A, 0x5A])) == 0
    assert checksum_u8(bytes([1, 2, 4])) == 7
    arr = np.array([0xDEADBEEF, 0xDEADBEEF, 5], dtype=np.uint32)
    assert checksum_u32(arr) == 5
    assert checksum_u32(arr.reshape(3, 1)) == 5  # shape-independent


def test_print_checksum_gating(monkeypatch, capsys):
    """HARD_QUIET / level / COMPUTE_FULL_CHECKSUMS gates mirror the
    reference's (log.rs:10-14, matrix.rs:19-24): quiet by default, named
    `{msg}: {checksum}` lines at DEBUG when fully enabled, checksum 0 when
    the compute gate is off."""
    arr = np.array([3, 5], dtype=np.uint32)

    dpdebug.print_checksum("H1", arr)             # default: fully quiet
    assert capsys.readouterr().err == ""

    monkeypatch.setattr(dpdebug, "HARD_QUIET", False)
    monkeypatch.setattr(dpdebug, "_LEVEL", dpdebug.DEBUG)
    dpdebug.print_checksum("H1", arr)             # compute gate still off
    assert capsys.readouterr().err == "H1: 0\n"

    monkeypatch.setattr(dpdebug, "COMPUTE_FULL_CHECKSUMS", True)
    dpdebug.print_checksum("H1", arr)
    assert capsys.readouterr().err == "H1: 6\n"

    monkeypatch.setattr(dpdebug, "_LEVEL", dpdebug.INFO)
    dpdebug.print_checksum("H1", arr)             # below DEBUG level
    assert capsys.readouterr().err == ""


def test_device_server_prints_same_names(monkeypatch, capsys):
    """The device server's answer path prints the same named fingerprints
    as the host scheme for the same response bytes (tiny config, CPU)."""
    pytest.importorskip("jax")
    from sdk_tpu.doublepir.server_jax import ChecklistServerJax

    params = DpParams.from_string("64,6.4,13,17,32,464")
    num_entries = params.l * params.m * 8
    rng = np.random.default_rng(4)
    bit_bytes = rng.integers(0, 256, (num_entries + 7) // 8, dtype=np.uint8)
    srv = ChecklistServerJax(num_entries, params, bit_bytes)
    srv.setup()
    lp3, mp3 = -(-params.l // 3) * 3, -(-params.m // 3) * 3
    queries = [[rng.integers(0, 1 << 32, (mp3, 1), dtype=np.uint64)
                .astype(np.uint32),
                rng.integers(0, 1 << 32, (lp3, 1), dtype=np.uint64)
                .astype(np.uint32)]]

    monkeypatch.setattr(dpdebug, "HARD_QUIET", False)
    monkeypatch.setattr(dpdebug, "_LEVEL", dpdebug.DEBUG)
    monkeypatch.setattr(dpdebug, "COMPUTE_FULL_CHECKSUMS", True)
    msg = srv.answer(queries)
    err = capsys.readouterr().err
    want = [f"h1: {checksum_u32(msg[0])}",
            f"a_2: {checksum_u32(msg[1])}",
            f"h_2: {checksum_u32(msg[2])}"]
    for line in want:
        assert line in err, (line, err)
