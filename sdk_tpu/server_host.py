"""Host (numpy) Spiral server pipeline — the reference oracle.

Implements the full server compute path in numpy with semantics matching
lib/spiral-rs/src/server.rs (coefficient expansion, Regev→GSW conversion,
first-dim multiply, GSW folding, packing, response encode). The production
TPU path (sdk_tpu.ops.pipeline) is verified stage-by-stage against this.
"""

from __future__ import annotations

import numpy as np

from . import poly
from .arith import U64, log2_ceil, log2_exact, recenter_mod_arr, rescale_arr
from .bitpack import write_fields
from .client import PublicParameters, Query, reorient_reg_ciphertexts
from .params import Params, Q2_VALUES
from .rng import ChaCha20Rng


def coefficient_expansion(v: list[np.ndarray], g: int, stop_round: int,
                          params: Params, v_w_left, v_w_right,
                          v_neg1, max_bits_to_gen_right: int) -> None:
    """Expand ct v[0] into 2^g cts in place (server.rs:19-121). v entries are
    NTT (2, 1) matrices."""
    for r in range(g):
        num_in = 1 << r
        t = (params.poly_len >> r) + 1
        neg1 = v_neg1[r]

        for i in range(num_in):
            v[num_in + i] = poly.scalar_multiply(params, neg1, v[i])

        for i in range(2 * num_in):
            if stop_round > 0 and r > stop_round and (i % 2) == 1:
                continue
            if (stop_round > 0 and r == stop_round and (i % 2) == 1
                    and (i // 2) >= max_bits_to_gen_right):
                continue

            if r != 0 and i % 2 == 0:
                w = v_w_left[r]
                t_exp = params.t_exp_left
            else:
                w = v_w_right[r]
                t_exp = params.t_exp_right

            ct = poly.from_ntt(params, v[i])
            ct_auto = poly.automorph_raw(params, ct, t)
            ginv_ct = poly.gadget_invert_rdim(params, t_exp, ct_auto[:1], 1)
            ginv_ct_ntt = poly.to_ntt_no_reduce(params, ginv_ct)
            ct_auto_1_ntt = poly.to_ntt(params, ct_auto[1:2])
            w_times_ginv_ct = poly.multiply(params, w, ginv_ct_ntt)

            res = v[i] + w_times_ginv_ct
            res[1] += ct_auto_1_ntt[0]
            for c in range(params.crt_count):
                res[:, :, c, :] %= U64(params.moduli[c])
            v[i] = res


def regev_to_gsw(v_inp: list[np.ndarray], v_conv: np.ndarray, params: Params,
                 num_gsw: int, idx_factor: int, idx_offset: int) -> list[np.ndarray]:
    """Convert t_gsw Regev cts per GSW ct into (2, 2*t_gsw) GSW cts
    (server.rs:123-151)."""
    out = []
    for i in range(num_gsw):
        ct = poly.ntt_zero(params, 2, 2 * params.t_gsw)
        for j in range(params.t_gsw):
            idx_ct = i * params.t_gsw + j
            idx_inp = idx_factor * idx_ct + idx_offset
            ct[:, 2 * j + 1 : 2 * j + 2] = v_inp[idx_inp]
            tmp_ct_raw = poly.from_ntt(params, v_inp[idx_inp])
            ginv = poly.gadget_invert(params, 2 * params.t_conv, tmp_ct_raw)
            ginv_ntt = poly.to_ntt(params, ginv)
            tmp_ct = poly.multiply(params, v_conv, ginv_ntt)
            ct[:, 2 * j : 2 * j + 1] = tmp_ct
        out.append(ct)
    return out


def build_db_tensor(params: Params, items: np.ndarray) -> np.ndarray:
    """Preprocess plaintext items into the NTT-domain DB tensor.

    items: (instances, trials, num_items, poly_len) uint64, values mod p.
    Returns (instances, trials, poly_len, crt, num_per, dim0) uint64 residues
    — the z-major layout of the reference's packed DB
    (server.rs:223-275 / lib/server loading.rs), with CRT channels split
    instead of bit-packed.
    """
    instances, trials, num_items, n = items.shape
    dim0 = 1 << params.db_dim_1
    num_per = 1 << params.db_dim_2
    assert num_items == dim0 * num_per
    recentered = recenter_mod_arr(items, params.pt_modulus, params.modulus)
    ntt = poly.to_ntt(params, recentered.reshape(-1, num_items, n))
    # (inst*trials, num_items, crt, n) -> (instances, trials, n(z), crt, num_per, dim0)
    ntt = ntt.reshape(instances, trials, num_items, params.crt_count, n)
    ntt = ntt.reshape(instances, trials, dim0, num_per, params.crt_count, n)
    return np.ascontiguousarray(ntt.transpose(0, 1, 5, 4, 3, 2))


def multiply_reg_by_database(params: Params, db_slice: np.ndarray,
                             v_firstdim: np.ndarray) -> list[np.ndarray]:
    """First-dimension multiply (server.rs:155-221).

    db_slice: (poly_len, crt, num_per, dim0) residues for one instance/trial.
    v_firstdim: packed u64 buffer [z][j][r] (reoriented query).
    Returns num_per NTT (2, 1) matrices.
    """
    n = params.poly_len
    dim0 = db_slice.shape[3]
    num_per = db_slice.shape[2]
    q = v_firstdim.reshape(n, dim0, 2)
    q0 = (q & U64(0xFFFFFFFF)).astype(np.uint64)          # channel 0
    q1 = (q >> U64(32)).astype(np.uint64)                  # channel 1
    d0 = db_slice[:, 0]  # (n, num_per, dim0)
    d1 = db_slice[:, 1]
    # sums fit: 2^28*2^28*dim0(<=2^10) < 2^66 — exceeds u64 for dim0 > 64!
    # match the reference's u128 accumulation by splitting the j-sum.
    out0 = _modmul_accum(d0, q0, params.moduli[0])  # (n, num_per, 2)
    out1 = _modmul_accum(d1, q1, params.moduli[1])
    res = []
    for i in range(num_per):
        ct = poly.ntt_zero(params, 2, 1)
        ct[0, 0, 0] = out0[:, i, 0]
        ct[0, 0, 1] = out1[:, i, 0]
        ct[1, 0, 0] = out0[:, i, 1]
        ct[1, 0, 1] = out1[:, i, 1]
        res.append(ct)
    return res


def _modmul_accum(d: np.ndarray, q: np.ndarray, modulus: int) -> np.ndarray:
    """sum_j d[z, i, j] * q[z, j, r] mod modulus, u64-safe via chunked sums.

    Products < 2^56; chunks of 64 keep partial sums < 2^62.
    """
    n, num_per, dim0 = d.shape
    out = np.zeros((n, num_per, 2), dtype=U64)
    CHUNK = 64
    for s in range(0, dim0, CHUNK):
        e = min(s + CHUNK, dim0)
        part = np.einsum("zij,zjr->zir", d[:, :, s:e], q[:, s:e, :])
        out = (out + part % U64(modulus)) % U64(modulus)
    return out


def get_v_folding_neg(params: Params, v_folding: list[np.ndarray]) -> list[np.ndarray]:
    gadget_ntt = poly.to_ntt(params, poly.build_gadget(params, 2, 2 * params.t_gsw))
    out = []
    for i in range(params.db_dim_2):
        inv = poly.invert_raw(params, poly.from_ntt(params, v_folding[i]))
        out.append(poly.add(params, gadget_ntt, poly.to_ntt(params, inv)))
    return out


def fold_ciphertexts(params: Params, v_cts: list[np.ndarray],
                     v_folding, v_folding_neg) -> None:
    """GSW-driven binary fold of raw (2,1) cts, in place (server.rs:388-427,
    with the sparse-DB all-zero shortcut of lib/server fold.rs:37-44).

    The shortcut is load-bearing, not an optimization: an exactly-zero input
    (absent DB row) must bypass the GSW selection. G^-1 digits are unsigned
    with mean z/2, so the key-error product E*(G^-1(b) - G^-1(a)) is only
    zero-mean when both sides carry digits; with one side zero the mean
    component survives as a cumulative-sum (low-frequency random walk) error
    of ~n*(z/2)^2*Var(E) per coefficient, far over the decode budget at
    production shapes (the reference marks this branch "crucial for
    correctness")."""
    if len(v_cts) == 1:
        return
    further_dims = log2_exact(len(v_cts))
    ell = v_folding[0].shape[1] // 2
    num_per = len(v_cts)
    for cur_dim in range(further_dims):
        num_per //= 2
        for i in range(num_per):
            if not v_cts[i].any():
                v_cts[i] = v_cts[num_per + i]
                continue
            if not v_cts[num_per + i].any():
                continue
            ginv_c = poly.gadget_invert(params, 2 * ell, v_cts[i])
            ginv_c_ntt = poly.to_ntt(params, ginv_c)
            prod = poly.multiply(params, v_folding_neg[further_dims - 1 - cur_dim],
                                 ginv_c_ntt)
            ginv_c = poly.gadget_invert(params, 2 * ell, v_cts[num_per + i])
            ginv_c_ntt = poly.to_ntt(params, ginv_c)
            sum_ = poly.multiply(params, v_folding[further_dims - 1 - cur_dim],
                                 ginv_c_ntt)
            v_cts[i] = poly.from_ntt(params, poly.add(params, sum_, prod))


def pack(params: Params, v_ct: list[np.ndarray], v_w: list[np.ndarray]) -> np.ndarray:
    """Pack n*n scalar Regev cts into one (n+1, n) matrix ct (server.rs:429-468,
    pack_v0)."""
    assert len(v_ct) >= params.n * params.n
    assert len(v_w) == params.n
    result = poly.ntt_zero(params, params.n + 1, params.n)
    for c in range(params.n):
        v_int = poly.ntt_zero(params, params.n + 1, 1)
        for r in range(params.n):
            w = v_w[r]
            ct = v_ct[r * params.n + c]
            ct_1 = ct[0:1]
            ct_2_ntt = poly.to_ntt(params, ct[1:2])
            ginv = poly.gadget_invert(params, params.t_conv, ct_1)
            ginv_ntt = poly.to_ntt(params, ginv)
            prod = poly.multiply(params, w, ginv_ntt)
            v_int[1 + r] = (v_int[1 + r] + ct_2_ntt[0])
            v_int = v_int + prod
            for cc in range(params.crt_count):
                v_int[:, :, cc, :] %= U64(params.moduli[cc])
        result[:, c : c + 1] = v_int
    return result


def pack_v1(params: Params, v_ct: list[np.ndarray], v_w: list[np.ndarray]) -> np.ndarray:
    """pack_v1 (lib/server/src/compute/pack.rs:46-100): 2 keys — w_key and
    w_shift. Each scalar ct keyswitches into row 1, then is rotated down to
    its row r by r applications of the shift key."""
    assert len(v_w) == 2
    w_key, w_shift = v_w[0], v_w[1]
    result = poly.ntt_zero(params, params.n + 1, params.n)
    for c in range(params.n):
        v_int = poly.ntt_zero(params, params.n + 1, 1)
        for r in range(params.n):
            ct = v_ct[r * params.n + c]
            ct_2_ntt = poly.to_ntt(params, ct[1:2])
            ginv = poly.gadget_invert(params, params.t_conv, ct[0:1])
            prod = poly.multiply(params, w_key, poly.to_ntt(params, ginv))
            prod[1:2] = poly.add(params, prod[1:2], ct_2_ntt)
            for _ in range(r):
                prod_ct_1_raw = poly.from_ntt(params, prod[0:1])
                prod_rest = prod[1:]
                ginv2 = poly.gadget_invert(params, params.t_conv, prod_ct_1_raw)
                part1 = poly.multiply(params, w_shift, poly.to_ntt(params, ginv2))
                part2 = poly.pad_top(params, poly.shift_rows_by_one(prod_rest), 1)
                prod = poly.add(params, part1, part2)
            v_int = poly.add(params, v_int, prod)
        result[:, c : c + 1] = v_int
    return result


def encode_response(params: Params, v_packed_ct: list[np.ndarray]) -> bytes:
    """Rescale and bit-pack the response (server.rs:470-503)."""
    q1 = 4 * params.pt_modulus
    q1_bits = log2_ceil(q1)
    q2 = Q2_VALUES[params.q2_bits]
    q2_bits = params.q2_bits

    num_bits = params.instances * (
        q2_bits * params.n * params.poly_len
        + q1_bits * params.n * params.n * params.poly_len)
    num_bytes = ((num_bits + 63) // 64) * 8
    result = bytearray(num_bytes)
    bit_offs = 0
    for instance in range(params.instances):
        packed = v_packed_ct[instance]  # raw (n+1, n, poly_len)
        first_row = rescale_arr(packed[0], params.modulus, q2)
        rest_rows = rescale_arr(packed[1:], params.modulus, q1)
        bit_offs = write_fields(result, first_row.reshape(-1), bit_offs, q2_bits)
        bit_offs = write_fields(result, rest_rows.reshape(-1), bit_offs, q1_bits)
    return bytes(result)


def expand_query(params: Params, pp: PublicParameters, query: Query):
    """server.rs:525-591."""
    dim0 = 1 << params.db_dim_1
    further_dims = params.db_dim_2
    g = params.g()
    right_expanded = params.t_gsw * further_dims
    stop_round = params.stop_round()

    v = [poly.ntt_zero(params, 2, 1) for _ in range(1 << g)]
    v[0] = poly.to_ntt(params, query.ct)

    v_conv = pp.v_conversion[0]
    v_w_left = pp.v_expansion_left
    v_w_right = pp.v_expansion_right or v_w_left
    v_neg1 = [poly.to_ntt(params, p.reshape(1, 1, -1))
              for p in params.get_v_neg1_raw()]

    if further_dims > 0:
        coefficient_expansion(v, g, stop_round, params, v_w_left, v_w_right,
                              v_neg1, right_expanded)
        v_reg_inp = [v[2 * i] for i in range(dim0)]
        v_gsw_inp = [v[2 * i + 1] for i in range(right_expanded)]
    else:
        coefficient_expansion(v, g, 0, params, v_w_left, v_w_left, v_neg1, 0)
        v_reg_inp = [v[i] for i in range(dim0)]
        v_gsw_inp = []

    v_reg_reoriented = reorient_reg_ciphertexts(params, v_reg_inp)
    v_folding = regev_to_gsw(v_gsw_inp, v_conv, params, params.db_dim_2, 1, 0)
    return v_reg_reoriented, v_folding


def process_query(params: Params, pp: PublicParameters, query: Query,
                  db: np.ndarray) -> bytes:
    """Full server pipeline on a DB tensor from build_db_tensor."""
    if params.expand_queries:
        v_reg_reoriented, v_folding = expand_query(params, pp, query)
    else:
        v_reg_reoriented = query.v_buf
        v_folding = [poly.to_ntt(params, ct) for ct in query.v_ct]
    v_folding_neg = get_v_folding_neg(params, v_folding)

    trials = params.n * params.n
    v_packed = []
    for instance in range(params.instances):
        v_ct = []
        for trial in range(trials):
            intermediate = multiply_reg_by_database(
                params, db[instance, trial], v_reg_reoriented)
            intermediate_raw = [poly.from_ntt(params, ct) for ct in intermediate]
            fold_ciphertexts(params, intermediate_raw, v_folding, v_folding_neg)
            if instance == 0 and trial == 0:
                # noise-localization hook (reference server.rs:713-729)
                from .debug_hooks import check_folded_ct
                check_folded_ct(params, intermediate_raw[0])
            v_ct.append(intermediate_raw[0])
        if params.version == 0:
            packed = pack(params, v_ct, pp.v_packing)
        else:
            packed = pack_v1(params, v_ct, pp.v_packing)
        v_packed.append(poly.from_ntt(params, packed))
    return encode_response(params, v_packed)


def generate_random_db_and_get_item(params: Params, item_idx: int,
                                    seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Random mod-p DB; returns (target item as (instances*n, n, poly_len)
    raw mod-p matrix, DB tensor). Mirrors server.rs:223-275."""
    rng = np.random.default_rng(seed)
    instances, trials = params.instances, params.n * params.n
    num_items = params.num_items()
    items = rng.integers(0, params.pt_modulus,
                         (instances, trials, num_items, params.poly_len),
                         dtype=np.uint64)
    item = np.zeros((params.instances * params.n, params.n, params.poly_len),
                    dtype=U64)
    for instance in range(instances):
        for trial in range(trials):
            item[instance * params.n + trial // params.n, trial % params.n] = \
                items[instance, trial, item_idx]
    db = build_db_tensor(params, items)
    return item, db
