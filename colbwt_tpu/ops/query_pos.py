"""Positional-automaton query engine — k pattern characters per gather.

The insight: the whole query step (col_pml::_query_pml + threshold_step,
include/col_bwt.hpp:498-574) is a pure function of (pattern char c, rank
position pos).  The reference state (interval, offset, pos) is redundant —
interval/offset are derivable from pos — and in *position space* LF needs no
fast-forward at all: LF(pos) = F_start(run(pos)) + (pos - idx[run(pos)]).

So tabulate the step function S_c : pos -> pos' once per char, and — because
position-keyed step functions COMPOSE (unlike the run-keyed mega rows, whose
next gather index depends on the evolving offset) — tabulate S_{c_k} ∘ … ∘
S_{c_1} for every k-tuple of chars.  One (A^k · n, 2)-int32 table row then
advances a read k characters with ONE gather: TPU gathers cost ~11-16 ns per
*index*, independent of table size (measured flat from 16 kB to 6.9 GB,
scripts/probe_bigtable_gather.py), so steps-per-read drops k-fold.

Row layout (A = sigma+1 dense chars, key = ((c_1·A + c_2)·A + …)·A + c_k in
processing order, i.e. c_1 is the read's rightmost unprocessed char):

  word0  final position after all k steps
  word1  bits 8j..8j+7   : col_id emitted at sub-step j (CID is sampled
                           BEFORE the step, include/col_bwt.hpp:513)
         bit  24+j       : match flag of sub-step j (drives the PML
                           extend-or-reset recurrence)

so k <= 3 fits one int32 of metadata.  Memory: A^k · n · 8 bytes — for a
4 Mbp pangenome at k=3 (A=6) that is ~7 GB of HBM; pick k by budget
(choose_k).  The per-read cost is ceil(m/k) gathers instead of m.

PML values are packed (pml << 8 | cid) into the scan outputs; valid for
reads shorter than 2**23 bases (guarded).

Tables are built ON DEVICE from the small per-run index arrays (r-sized),
avoiding any host->device transfer of the O(A^k n) tables themselves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from colbwt_tpu.models.index import ColPmlIndex

INT32_MAX = 2**31 - 1
_PML_PACK_LIMIT = 1 << 23


def choose_k(index: ColPmlIndex, hbm_budget_bytes: int = 10 << 30) -> int:
    """Largest k in {1,2,3} whose table fits the HBM budget and whose gather
    indices fit int32."""
    A = index.sigma + 1
    best = 0
    for k in (1, 2, 3):
        keys = A ** k
        if keys * index.n > INT32_MAX:
            break
        if keys * index.n * 8 > hbm_budget_bytes:
            break
        best = k
    return best


@functools.partial(jax.jit, static_argnames=("n", "A"))
def _build_t1(char, idx, length, lf_pos0, threshold, pred_jump, succ_jump,
              col_id, n: int, A: int):
    """T1[c*n + pos] = (new_pos, col_id | match<<24-bit layout) for one step."""
    r = char.shape[0]
    pos = jax.lax.iota(jnp.int32, n)
    run = jnp.searchsorted(idx, pos, side="right").astype(jnp.int32) - 1
    offset = pos - jnp.take(idx, run)
    run_char = jnp.take(char, run)
    run_cid = jnp.take(col_id, run)
    lf_match = jnp.take(lf_pos0, run) + offset  # LF needs no ff in pos space

    def per_char(c):
        match = run_char == c
        si = jnp.take(succ_jump[c], run)
        pi = jnp.take(pred_jump[c], run)
        has_succ = si < r
        has_pred = pi >= 0
        thr = jnp.where(has_succ,
                        jnp.take(threshold, jnp.minimum(si, r - 1)), n)
        succ_pos = jnp.take(lf_pos0, jnp.minimum(si, r - 1))
        pic = jnp.maximum(pi, 0)
        pred_pos = jnp.take(lf_pos0, pic) + jnp.take(length, pic) - 1
        # threshold_step priority (include/col_bwt.hpp:531-574): pred iff
        # pos < thr and pred exists (thr == n encodes no successor, making
        # pos < thr true); else succ; else LF from the unmoved state.
        take_pred = (pos < thr) & has_pred
        take_succ = (~take_pred) & has_succ
        repos = jnp.where(take_pred, pred_pos,
                          jnp.where(take_succ, succ_pos, lf_match))
        new_pos = jnp.where(match, lf_match, repos)
        meta = run_cid | (match.astype(jnp.int32) << 24)
        return jnp.stack([new_pos, meta], axis=1)

    blocks = jax.lax.map(per_char, jnp.arange(A, dtype=jnp.int32))
    return blocks.reshape(A * n, 2)


@functools.partial(jax.jit, static_argnames=("n", "A", "k"),
                   donate_argnums=(0,))
def _build_tk(buf, t1, n: int, A: int, k: int):
    """Fill T_k composed directly from T1 (k-1 chained gathers per element):
    no intermediate T_j is ever materialized, and the donated output buffer
    is updated in place by the fori_loop (lax.map's stacked-ys accumulator
    double-buffers, which OOMs for multi-GB tables — measured on v5e).

    Peak memory: T_k + T1 + one (n, 2) block.  Sub-step j's cid lands at
    bits 8j, its match bit at 24+j."""

    def body(key, buf):
        digits = []  # big-endian: first processed char is the high digit
        rem = key
        for j in range(k):
            p = A ** (k - 1 - j)
            digits.append(rem // p)
            rem = rem % p
        blk = jax.lax.dynamic_slice(t1, (digits[0] * n, 0), (n, 2))
        pos = blk[:, 0]
        meta = blk[:, 1]
        for j in range(1, k):
            nxt = jnp.take(t1, digits[j] * n + pos, axis=0, mode="clip")
            pos = nxt[:, 0]
            meta = meta | ((nxt[:, 1] & 0xFF) << (8 * j)) \
                | (((nxt[:, 1] >> 24) & 1) << (24 + j))
        block = jnp.stack([pos, meta], axis=1)
        return jax.lax.dynamic_update_slice(buf, block, (key * n, 0))

    return jax.lax.fori_loop(0, A ** k, body, buf)


def build_pos_tables(index: ColPmlIndex, k: int | None = None,
                     hbm_budget_bytes: int = 10 << 30) -> dict:
    if index.wide:
        raise ValueError("positional tables need n < 2**31 "
                         "(use ops.query_mega_wide for wide indexes)")
    if k is None:
        k = choose_k(index, hbm_budget_bytes)
        if k == 0:
            raise ValueError("no k fits the HBM budget; use ops.query_mega")
    if not 1 <= k <= 3:
        raise ValueError("k must be in {1, 2, 3} (metadata packs 8 bits of "
                         "cid + 1 match bit per sub-step into one int32)")
    A = index.sigma + 1
    n, r = index.n, index.r
    if (A ** k) * n > INT32_MAX:
        raise ValueError(f"A**k * n = {(A ** k) * n} overflows int32 gather "
                         f"indices (A={A}, k={k}, n={n})")

    idx = jnp.asarray(index.idx.astype(np.int32))
    length = jnp.asarray(index.length.astype(np.int32))
    di = index.dest_interval.astype(np.int64)
    lf_pos0 = jnp.asarray((index.idx.astype(np.int64)[di]
                           + index.dest_offset.astype(np.int64)
                           ).astype(np.int32))
    t1 = _build_t1(
        jnp.asarray(index.char), idx, length, lf_pos0,
        jnp.asarray(index.threshold.astype(np.int32)),
        jnp.asarray(index.pred_jump), jnp.asarray(index.succ_jump),
        jnp.asarray(index.col_id), n=n, A=A)
    if k == 1:
        table = t1
    else:
        buf = jnp.zeros((A ** k * n, 2), dtype=jnp.int32)
        table = _build_tk(buf, t1, n=n, A=A, k=k)
        del buf, t1
    return {
        "table": table,
        "n": jnp.int32(n),
        "k": k,
        "A": A,
    }


def _fold_keys(cols: jnp.ndarray, k: int, A: int) -> jnp.ndarray:
    """(M, B) reversed char columns -> (M/k, B) composed keys."""
    M, B = cols.shape
    assert M % k == 0
    grp = cols.reshape(M // k, k, B)
    key = grp[:, 0]
    for j in range(1, k):
        key = key * A + grp[:, j]
    return key


@functools.partial(jax.jit, static_argnames=("k", "A", "masked", "unroll"))
def query_chunk_pos(pt_table, n, patterns, lengths, pos0, mlen0, step_offset,
                    k: int, A: int, masked: bool = False, unroll: int = 4):
    """One scan over a (B, M) chunk (M multiple of k).  Returns
    ((pml, cid), (pos, mlen)).

    State past a lane's end is deliberately NOT masked: reads are
    right-aligned, so every step after a lane's last real character consumes
    left-padding — and all later chunks for that lane are padding too, so the
    corrupted state can never reach a kept output.  masked=True only zeroes
    the pad outputs (cosmetic, for the chunked long-read path's reuse of
    output buffers)."""
    B, M = patterns.shape
    cols = patterns[:, ::-1].T.astype(jnp.int32)
    keys = _fold_keys(cols, k, A)
    steps = (jnp.arange(M // k, dtype=jnp.int32) * k) + step_offset

    def body(state, xs):
        pos, mlen = state
        key_col, i = xs
        rows = jnp.take(pt_table, key_col * n + pos, axis=0, mode="clip")
        meta = rows[:, 1]
        outs = []
        ln = mlen
        for j in range(k):
            m = (meta >> (24 + j)) & 1
            ln = (ln + 1) * m  # match ? len+1 : 0
            cid = (meta >> (8 * j)) & 0xFF
            packed = (ln << 8) | cid
            if masked:
                packed = jnp.where(i + j < lengths, packed, 0)
            outs.append(packed)
        return (rows[:, 0], ln), jnp.stack(outs)

    (pos, mlen), ys = jax.lax.scan(body, (pos0, mlen0), (keys, steps),
                                   unroll=unroll)
    packed = ys.reshape(M, B).T[:, ::-1]
    return (packed >> 8, packed & 0xFF), (pos, mlen)


@functools.partial(jax.jit, static_argnames=("k", "A"))
def query_batch_pos(pt_table, n, patterns, lengths, k: int, A: int):
    B = patterns.shape[0]
    pos0 = jnp.broadcast_to(n - 1, (B,)).astype(jnp.int32)
    mlen0 = jnp.zeros((B,), dtype=jnp.int32)
    (pml, cid), _ = query_chunk_pos(pt_table, n, patterns, lengths,
                                    pos0, mlen0, jnp.int32(0), k=k, A=A)
    return pml, cid


def query_batch(index: ColPmlIndex, patterns: list[bytes],
                max_len: int | None = None, pt: dict | None = None,
                k: int | None = None
                ) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Batched PML+CID queries through the positional-automaton tables."""
    if pt is None:
        pt = build_pos_tables(index, k)
    k = pt["k"]
    m_raw = max_len if max_len is not None else max(
        (len(p) for p in patterns), default=1)
    M = -(-m_raw // k) * k  # pad to a multiple of k (pads process last)
    if M >= _PML_PACK_LIMIT:
        raise ValueError(f"read length {M} overflows the pml<<8 packing")
    enc, lens = index.encode_patterns(patterns, max_len=M)
    pml, cid = query_batch_pos(pt["table"], pt["n"], jnp.asarray(enc),
                               jnp.asarray(lens), k=k, A=pt["A"])
    pml = np.asarray(pml)
    cid = np.asarray(cid)
    return ([pml[b, M - int(lens[b]):] for b in range(len(patterns))],
            [cid[b, M - int(lens[b]):] for b in range(len(patterns))])


def query_long_reads(index: ColPmlIndex, patterns: list[bytes],
                     chunk: int = 2048, pt: dict | None = None,
                     k: int | None = None
                     ) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Arbitrary-length reads via chunked scans with carried (pos, mlen)
    state — the -l mode (src/pml_query.cpp:126-128) on the positional
    engine.  Exactly equivalent to one giant scan (differential-tested)."""
    if pt is None:
        pt = build_pos_tables(index, k)
    k = pt["k"]
    A = pt["A"]
    chunk = -(-chunk // k) * k
    B = len(patterns)
    max_m = max((len(p) for p in patterns), default=1)
    n_chunks = max(1, -(-max_m // chunk))
    M = n_chunks * chunk
    if M >= _PML_PACK_LIMIT:
        raise ValueError(f"padded length {M} overflows the pml<<8 packing")
    enc, lens = index.encode_patterns(patterns, max_len=M)
    enc_j = jnp.asarray(enc)
    lens_j = jnp.asarray(lens)

    pml_full = np.zeros((B, M), dtype=np.int32)
    cid_full = np.zeros((B, M), dtype=np.int32)
    pos = jnp.broadcast_to(pt["n"] - 1, (B,)).astype(jnp.int32)
    mlen = jnp.zeros((B,), dtype=jnp.int32)
    for j in range(n_chunks):
        lo = M - (j + 1) * chunk
        (pml, cid), (pos, mlen) = query_chunk_pos(
            pt["table"], pt["n"], enc_j[:, lo:lo + chunk], lens_j,
            pos, mlen, jnp.int32(j * chunk), k=k, A=A, masked=True)
        pml_full[:, lo:lo + chunk] = np.asarray(pml)
        cid_full[:, lo:lo + chunk] = np.asarray(cid)
    return ([pml_full[b, M - int(lens[b]):] for b in range(B)],
            [cid_full[b, M - int(lens[b]):] for b in range(B)])
