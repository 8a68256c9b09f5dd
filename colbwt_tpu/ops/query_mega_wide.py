"""Wide mega-row query engine — large-n (n >= 2**31) variant of ops.query_mega.

The reference's position budget is n < 2**40 (idx:40b, threshold:40b packed
fields, include/ds/LF_table.hpp:36-39, include/col_bwt.hpp:84) — beyond int32
but far under int64.  TPU int32 is the fast lane and x64 mode is global and
costly, so position-valued quantities (pos, thresholds, LF rank positions)
travel as TWO int32 limbs in base 2**30:

    value = hi * 2**30 + lo,   lo in [0, 2**30)

Adding an intra-run offset (< 2**29, enforced by ops.run_split.
split_runs_max_len at index build) to a lo limb stays below 2**31 — one
conditional carry normalizes.  Ordering tests are (hi, lo) lexicographic.
Run-valued quantities (interval, r) remain single int32, matching the
reference's RUN_BYTES=4 budget (r < 2**32).

Gather cost on TPU is per *index*, width-free (docs/DESIGN_NOTES.md), so the
wide row — 17 int32 columns instead of 16 — still costs ONE gather per read
per character; large-n querying runs at narrow-engine speed.

Semantics are identical to ops.query_mega / the int64 NumPy oracle
(col_pml::_query_pml, include/col_bwt.hpp:498-574), differential-tested on
scaled move tables with n > 2**31.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from colbwt_tpu.models.index import MAX_WIDE_RUN_LEN, ColPmlIndex

NO_STATE = -1
LIMB = 2**30

# wide mega-row column layout
_MATCH, _CID, _DI0, _DOFF0, _LF_LO, _LF_HI, _DLEN0 = range(7)
_THR_LO, _THR_HI = 7, 8
_S_INT, _S_OFF, _S_LO, _S_HI = 9, 10, 11, 12
_P_INT, _P_OFF, _P_LO, _P_HI = 13, 14, 15, 16
_WIDTH = 17


def _limbs(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    v = np.asarray(v, dtype=np.int64)
    return ((v % LIMB).astype(np.int32), (v // LIMB).astype(np.int32))


def build_mega_table_wide(index: ColPmlIndex) -> dict:
    if index.ff_bound < 2:
        raise ValueError("mega engine requires a run-split index "
                         "(ColPmlIndex.build(tbl, ff_bound=2))")
    if int(index.length.max(initial=0)) > MAX_WIDE_RUN_LEN:
        raise ValueError("run lengths must be <= 2**29 for limb arithmetic; "
                         "build with ColPmlIndex.build")
    r, n = index.r, index.n
    char = index.char.astype(np.int64)
    col_id = index.col_id.astype(np.int64)
    idx = index.idx.astype(np.int64)
    length = index.length.astype(np.int64)
    di = index.dest_interval.astype(np.int64)
    doff = index.dest_offset.astype(np.int64)
    thr = index.threshold.astype(np.int64)
    sigma = index.sigma

    lf_pos0 = idx[di] + doff
    dlen0 = length[di]

    def resolve(start_run, start_off, ok):
        sr = np.where(ok, start_run, 0)
        d = di[sr]
        o = doff[sr] + start_off
        pos = idx[d] + o
        out_int = np.searchsorted(idx, pos, side="right") - 1
        out_off = pos - idx[out_int]
        return (np.where(ok, out_int, NO_STATE),
                np.where(ok, out_off, 0),
                np.where(ok, pos, 0))

    mega = np.zeros(((sigma + 1) * r, _WIDTH), dtype=np.int32)
    for c in range(sigma + 1):
        blk = mega[c * r:(c + 1) * r]
        blk[:, _MATCH] = (char == c)
        blk[:, _CID] = col_id
        blk[:, _DI0] = di
        blk[:, _DOFF0] = doff
        blk[:, _LF_LO], blk[:, _LF_HI] = _limbs(lf_pos0)
        blk[:, _DLEN0] = dlen0
        si = index.succ_jump[c].astype(np.int64)
        pi = index.pred_jump[c].astype(np.int64)
        has_succ = si < r
        has_pred = pi >= 0
        thr_c = np.where(has_succ, thr[np.minimum(si, r - 1)], n)
        blk[:, _THR_LO], blk[:, _THR_HI] = _limbs(thr_c)
        s_int, s_off, s_pos = resolve(si, np.zeros(r, dtype=np.int64), has_succ)
        blk[:, _S_INT], blk[:, _S_OFF] = s_int, s_off
        blk[:, _S_LO], blk[:, _S_HI] = _limbs(s_pos)
        p_run = np.maximum(pi, 0)
        p_int, p_off, p_pos = resolve(p_run, length[p_run] - 1, has_pred)
        blk[:, _P_INT], blk[:, _P_OFF] = p_int, p_off
        blk[:, _P_LO], blk[:, _P_HI] = _limbs(p_pos)

    from colbwt_tpu.utils.xfer import device_put_chunked

    n_lo, n_hi = _limbs(np.array([n]))
    last_lo, last_hi = _limbs(np.array([n - 1]))
    return {
        "mega": device_put_chunked(mega),
        "length": jnp.asarray(length.astype(np.int32)),
        "n_lo": jnp.int32(int(n_lo[0])), "n_hi": jnp.int32(int(n_hi[0])),
        "pos0_lo": jnp.int32(int(last_lo[0])),
        "pos0_hi": jnp.int32(int(last_hi[0])),
        "r": jnp.int32(r),
        "last_len": jnp.int32(int(length[r - 1])),
    }


def initial_state_wide(mt: dict, batch: int):
    """Query start state (include/col_bwt.hpp:503-507): bottom of the BWT,
    pos = n-1 as limbs."""
    B = batch
    r = mt["r"]
    return (jnp.broadcast_to(r - 1, (B,)).astype(jnp.int32),
            jnp.broadcast_to(mt["last_len"] - 1, (B,)).astype(jnp.int32),
            jnp.broadcast_to(mt["pos0_lo"], (B,)).astype(jnp.int32),
            jnp.broadcast_to(mt["pos0_hi"], (B,)).astype(jnp.int32),
            jnp.zeros((B,), dtype=jnp.int32))


def _lt(a_hi, a_lo, b_hi, b_lo):
    """(a_hi, a_lo) < (b_hi, b_lo) lexicographic — value order for limbs."""
    return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))


@functools.partial(jax.jit, static_argnames=("unroll", "ff_bound", "masked"))
def query_chunk_mega_wide(mt: dict, patterns: jnp.ndarray,
                          lengths: jnp.ndarray, state,
                          step_offset: jnp.ndarray, unroll: int = 4,
                          ff_bound: int = 2, masked: bool = True):
    """One chunk of the backward scan, carried state, limb positions.
    Mirrors ops.query_mega.query_chunk_mega exactly apart from the limb
    arithmetic; see that docstring for masked/ff_bound semantics."""
    B, M = patterns.shape
    r = mt["r"]
    mega = mt["mega"]
    length_arr = mt["length"]
    n_lo, n_hi = mt["n_lo"], mt["n_hi"]

    cols = patterns[:, ::-1].T
    steps = jnp.arange(M, dtype=jnp.int32) + step_offset

    def body(state, xs):
        interval, offset, pos_lo, pos_hi, mlen = state
        c, i = xs
        valid = i < lengths

        rows = jnp.take(mega, c * r + interval, axis=0, mode="clip")  # 1 gather
        match = rows[:, _MATCH] == 1
        cid_out = rows[:, _CID]

        # match / no-reposition path: LF + fast-forward
        doff = rows[:, _DOFF0] + offset
        lf_lo = rows[:, _LF_LO] + offset
        carry = (lf_lo >= LIMB).astype(jnp.int32)
        lf_lo = lf_lo - carry * LIMB
        lf_hi = rows[:, _LF_HI] + carry
        over = doff >= rows[:, _DLEN0]
        di = rows[:, _DI0] + over.astype(jnp.int32)
        doff = doff - jnp.where(over, rows[:, _DLEN0], 0)
        for _ in range(ff_bound - 2):
            ln = jnp.take(length_arr, di, mode="clip")
            over = doff >= ln
            di = di + over.astype(jnp.int32)
            doff = doff - jnp.where(over, ln, 0)

        # threshold_step (include/col_bwt.hpp:531-574): pred if pos < thr and
        # one exists; else succ if one exists (thr == n encodes "none")
        thr_lo, thr_hi = rows[:, _THR_LO], rows[:, _THR_HI]
        use_pred = _lt(pos_hi, pos_lo, thr_hi, thr_lo)
        has_pred = rows[:, _P_INT] >= 0
        has_succ = _lt(thr_hi, thr_lo, n_hi, n_lo)
        take_pred = (~match) & use_pred & has_pred
        take_succ = (~match) & (~take_pred) & has_succ

        new_interval = jnp.where(take_pred, rows[:, _P_INT],
                                 jnp.where(take_succ, rows[:, _S_INT], di))
        new_offset = jnp.where(take_pred, rows[:, _P_OFF],
                               jnp.where(take_succ, rows[:, _S_OFF], doff))
        new_lo = jnp.where(take_pred, rows[:, _P_LO],
                           jnp.where(take_succ, rows[:, _S_LO], lf_lo))
        new_hi = jnp.where(take_pred, rows[:, _P_HI],
                           jnp.where(take_succ, rows[:, _S_HI], lf_hi))
        new_len = jnp.where(match, mlen + 1, 0)

        if not masked:
            return ((new_interval, new_offset, new_lo, new_hi, new_len),
                    (new_len, cid_out))
        interval = jnp.where(valid, new_interval, interval)
        offset = jnp.where(valid, new_offset, offset)
        pos_lo = jnp.where(valid, new_lo, pos_lo)
        pos_hi = jnp.where(valid, new_hi, pos_hi)
        mlen = jnp.where(valid, new_len, mlen)
        return ((interval, offset, pos_lo, pos_hi, mlen),
                (jnp.where(valid, new_len, 0), jnp.where(valid, cid_out, 0)))

    final, (pml_steps, cid_steps) = jax.lax.scan(
        body, state, (cols, steps), unroll=unroll)
    return (pml_steps.T[:, ::-1], cid_steps.T[:, ::-1]), final


@functools.partial(jax.jit, static_argnames=("unroll", "ff_bound"))
def query_batch_mega_wide(mt: dict, patterns: jnp.ndarray,
                          lengths: jnp.ndarray, unroll: int = 4,
                          ff_bound: int = 2
                          ) -> tuple[jnp.ndarray, jnp.ndarray]:
    (pml, cid), _ = query_chunk_mega_wide(
        mt, patterns, lengths, initial_state_wide(mt, patterns.shape[0]),
        jnp.int32(0), unroll=unroll, ff_bound=ff_bound, masked=False)
    return pml, cid


def query_long_reads(index: ColPmlIndex, patterns: list[bytes],
                     chunk: int = 2048, mt: dict | None = None
                     ) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Chunked state-carrying scans for arbitrary-length reads (wide)."""
    if mt is None:
        mt = build_mega_table_wide(index)
    B = len(patterns)
    max_m = max((len(p) for p in patterns), default=1)
    n_chunks = max(1, -(-max_m // chunk))
    M = n_chunks * chunk
    enc, lens = index.encode_patterns(patterns, max_len=M)
    enc_j = jnp.asarray(enc)
    lens_j = jnp.asarray(lens)

    pml_full = np.zeros((B, M), dtype=np.int32)
    cid_full = np.zeros((B, M), dtype=np.int32)
    state = initial_state_wide(mt, B)
    for j in range(n_chunks):
        lo = M - (j + 1) * chunk
        cols = enc_j[:, lo:lo + chunk]
        (pml, cid), state = query_chunk_mega_wide(
            mt, cols, lens_j, state, jnp.int32(j * chunk),
            ff_bound=index.ff_bound)
        pml_full[:, lo:lo + chunk] = np.asarray(pml)
        cid_full[:, lo:lo + chunk] = np.asarray(cid)
    return ([pml_full[b, M - int(lens[b]):] for b in range(B)],
            [cid_full[b, M - int(lens[b]):] for b in range(B)])


def query_batch(index: ColPmlIndex, patterns: list[bytes],
                max_len: int | None = None, mt: dict | None = None
                ) -> tuple[list[np.ndarray], list[np.ndarray]]:
    if mt is None:
        mt = build_mega_table_wide(index)
    enc, lens = index.encode_patterns(patterns, max_len)
    pml, cid = query_batch_mega_wide(mt, jnp.asarray(enc), jnp.asarray(lens),
                                     ff_bound=index.ff_bound)
    pml = np.asarray(pml)
    cid = np.asarray(cid)
    M = enc.shape[1]
    return ([pml[b, M - int(lens[b]):] for b in range(len(patterns))],
            [cid[b, M - int(lens[b]):] for b in range(len(patterns))])
