"""Device-side index construction: suffix array, LCP, multi-MUMs, thresholds.

The reference offloads all of this to the mumemto fork's prefix-free parsing
pipeline (SURVEY §2.2: PFP → SA/LCP → multi-MUMs + thresholds, [inferred]).
Here it is rebuilt TPU-first on sort/scan primitives:

- suffix array: prefix doubling — log2(n) rounds of one fused int64 key sort
  (`jax.numpy.argsort` → XLA sort) plus a cumsum re-ranking.  O(n log n) work,
  all MXU/VPU-friendly, no data-dependent control flow.
- LCP: binary lifting over the retained per-round rank arrays (LCE(a,b) in
  O(log n) vectorized compares), instead of the inherently sequential Kasai
  walk of the host oracle.  Memory: n * log2(n) int32 for the rank pyramid.
- multi-MUMs: the SURVEY §2.2 window conditions evaluated for every rank
  position at once — sliding-window minima by the two-cummin van Herk trick
  (O(n) scratch at any N), document coverage via next-same-doc sliding
  minima, left-maximality by run-ids of the preceding-char array.
- thresholds: per-character segmented argmin of LCP between consecutive
  same-char runs (two segment_min passes; first-position tie-break matching
  np.argmin).

Every function is differential-tested against colbwt_tpu.ops.oracle.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# suffix array (prefix doubling)
# ---------------------------------------------------------------------------


def _rerank(order: jnp.ndarray, key_hi: jnp.ndarray, key_lo: jnp.ndarray
            ) -> jnp.ndarray:
    """Assign dense ranks to sorted (hi, lo) key pairs."""
    hi_s = key_hi[order]
    lo_s = key_lo[order]
    changed = jnp.ones(order.shape, dtype=jnp.int32)
    changed = changed.at[1:].set(
        ((hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])).astype(jnp.int32))
    ranks_sorted = jnp.cumsum(changed) - 1
    return jnp.zeros_like(ranks_sorted).at[order].set(ranks_sorted)


@jax.jit
def _doubling_round(rank: jnp.ndarray, k: jnp.ndarray):
    """One prefix-doubling round: sort by (rank, rank_{+k}), re-rank.

    k is traced (jnp.roll + mask) so every round shares one compiled program.
    The lexicographic pair sort is two stable single-key argsorts — int32-safe
    at any n (a fused int key would overflow past n ~ 46k without x64) and
    ~3x faster than one variadic 2-key lax.sort, whose custom comparator hits
    TPU's slow sort path (measured)."""
    n = rank.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    next_rank = jnp.where(iota < n - k, jnp.roll(rank, -k), -1)
    o1 = jnp.argsort(next_rank, stable=True).astype(jnp.int32)
    order = jnp.take(o1, jnp.argsort(jnp.take(rank, o1), stable=True)
                     ).astype(jnp.int32)
    new_rank = _rerank(order, rank, next_rank)
    return order, new_rank, new_rank[order[-1]]


def suffix_array_jax(ranks0: np.ndarray, with_pyramid: bool = False):
    """Prefix-doubling suffix array with per-round early exit.

    Rounds run as separate jit calls so the host can stop as soon as all
    ranks are distinct (max rank == n-1).  On pangenome collections the
    distinct-separator convention plus mutation density separates ranks after
    ~log2(mean mutation distance) rounds — typically 8-12 instead of
    ceil(log2 n) — a 2-3x build-time win.  Returns (sa, rank[, pyramid]);
    pyramid[j] ranks substrings of length 2**(j+1) for the LCP lifting (all
    LCP values are < 2**R at exit, so the truncated pyramid still covers
    every LCE decomposition).
    """
    n = int(ranks0.size)
    num_rounds = max(1, math.ceil(math.log2(max(n, 2))))
    rank = jnp.asarray(ranks0, dtype=jnp.int32)
    sa = jnp.argsort(rank, stable=True).astype(jnp.int32)
    pyramid = []
    k = 1
    for _ in range(num_rounds):
        sa, rank, max_rank = _doubling_round(rank, jnp.int32(k))
        if with_pyramid:
            pyramid.append(rank)
        k *= 2
        if int(max_rank) == n - 1:
            break
    if with_pyramid:
        return (np.asarray(sa), np.asarray(rank),
                [np.asarray(p) for p in pyramid])
    return np.asarray(sa), np.asarray(rank)


# ---------------------------------------------------------------------------
# LCP by binary lifting
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("num_rounds",))
def lcp_from_pyramid(ranks0: jnp.ndarray, sa: jnp.ndarray,
                     pyramid: list[jnp.ndarray], num_rounds: int) -> jnp.ndarray:
    """lcp[i] = LCE(sa[i-1], sa[i]) via descending power-of-two probes.

    pyramid[j][p] ranks the substring text[p : p + 2**(j+1)] (end-padded).
    Two suffixes share a prefix of length >= h + 2**j iff their pyramid[j-?]
    ranks at offset h agree; out-of-range probes compare unequal via the
    sentinel -1.
    """
    n = ranks0.shape[0]
    a = sa[:-1]
    b = sa[1:]
    h = jnp.zeros(a.shape, dtype=jnp.int32)

    def probe(level_ranks: jnp.ndarray, a, b, h, width: int):
        pa = a + h
        pb = b + h
        ra = jnp.where(pa < n, jnp.take(level_ranks, jnp.minimum(pa, n - 1)), -1)
        rb = jnp.where(pb < n, jnp.take(level_ranks, jnp.minimum(pb, n - 1)), -2)
        eq = ra == rb
        return h + jnp.where(eq, width, 0)

    # widths 2**num_rounds ... 2, then 1 via the base ranks
    for j in range(num_rounds - 1, -1, -1):
        h = probe(pyramid[j], a, b, h, 1 << (j + 1))
    h = probe(ranks0.astype(jnp.int32), a, b, h, 1)
    lcp = jnp.zeros((n,), dtype=jnp.int32).at[1:].set(h)
    return lcp


def lcp_jax(ranks0: np.ndarray, sa: np.ndarray, pyramid: list[np.ndarray]
            ) -> np.ndarray:
    return np.asarray(lcp_from_pyramid(
        jnp.asarray(ranks0, dtype=jnp.int32), jnp.asarray(sa, dtype=jnp.int32),
        [jnp.asarray(p) for p in pyramid], len(pyramid)))


# ---------------------------------------------------------------------------
# multi-MUM scan
# ---------------------------------------------------------------------------


def _sliding_min(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """out[i] = min(x[i : i+w]) treating x[>=n] as +inf (w >= 1).

    van Herk/Gil-Werman: pad to w-blocks, cummin within blocks forward (P)
    and backward (S); a window [i, i+w) spans at most two blocks, so
    out[i] = min(S[i], P[i+w-1]).  O(n) work and ~2n scratch — independent
    of w, unlike sparse-table doubling's n*log2(w) levels, which at the
    10k-document configs (w = N) cost 14x the input in HBM.
    """
    if w == 1:
        return x
    n = x.shape[0]
    big = jnp.iinfo(x.dtype).max
    pad = (-n) % w + w                       # round up + one spare block
    xp = jnp.concatenate([x, jnp.full((pad,), big, x.dtype)])
    blocks = xp.reshape(-1, w)
    p = jax.lax.cummin(blocks, axis=1).reshape(-1)
    s = jax.lax.cummin(blocks, axis=1, reverse=True).reshape(-1)
    return jnp.minimum(s[:n], p[w - 1:n + w - 1])


@functools.partial(jax.jit, static_argnames=("num_docs", "min_mum"))
def multi_mum_scan(lcp: jnp.ndarray, sa_docs: jnp.ndarray,
                   prev_rank: jnp.ndarray, num_docs: int, min_mum: int
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the multi-MUM window conditions at every rank position.

    Returns (is_mum mask over window starts, ell window lengths); see
    oracle.find_multi_mums for the condition definitions.  Works for any
    number of documents: a height-N window covers all N docs iff no document
    repeats inside it, i.e. min over the window of next-same-doc-occurrence
    indices lands at or past the window end (sliding-window minimum of the
    `nxt` array — O(n) work and scratch at any N, so the 10k-genome configs
    fit in HBM).
    """
    n = lcp.shape[0]
    N = num_docs
    lcp_ext = jnp.concatenate([lcp, jnp.zeros((N,), lcp.dtype)])  # lcp[>=n] = 0

    # ell[i] = min lcp[i+1 .. i+N-1]  (window of width N-1 starting at i+1)
    inner = _sliding_min(lcp_ext[1:], N - 1)[:n]          # index i -> window at i+1
    ell = inner

    uniq = (lcp_ext[:n] < ell) & (lcp_ext[N:N + n] < ell)

    # doc coverage: window [i, i+N) is a permutation of the N docs iff no doc
    # repeats inside it.  nxt[i] = next j > i with sa_docs[j] == sa_docs[i].
    pos = jnp.arange(n, dtype=jnp.int32)
    order = jnp.argsort(sa_docs * 1, stable=True)  # group by doc, pos ascending
    pos_sorted = jnp.take(pos, order)
    doc_sorted = jnp.take(sa_docs, order)
    nxt_sorted = jnp.concatenate([pos_sorted[1:], jnp.full((1,), n, jnp.int32)])
    same_doc = jnp.concatenate(
        [doc_sorted[1:] == doc_sorted[:-1], jnp.zeros((1,), bool)])
    nxt_sorted = jnp.where(same_doc, nxt_sorted, n)
    nxt = jnp.zeros((n,), dtype=jnp.int32).at[order].set(nxt_sorted)
    win_min_nxt = _sliding_min(nxt, N)
    covers = win_min_nxt >= pos + N

    # left-maximality: preceding chars not all equal across the window
    run_change = jnp.ones((n,), dtype=jnp.int32)
    run_change = run_change.at[1:].set(
        (prev_rank[1:] != prev_rank[:-1]).astype(jnp.int32))
    run_id = jnp.cumsum(run_change)
    last = jnp.concatenate(
        [run_id[N - 1:], jnp.full((N - 1,), -1, dtype=run_id.dtype)])
    left_max = run_id != last

    in_range = jnp.arange(n, dtype=jnp.int32) <= (n - N)
    is_mum = (ell >= min_mum) & uniq & covers & left_max & in_range
    return is_mum, ell


def find_multi_mums_jax(ranks: np.ndarray, sa: np.ndarray, lcp: np.ndarray,
                        doc_ids: np.ndarray, num_docs: int, min_mum: int = 1
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Host wrapper matching oracle.find_multi_mums' signature and outputs."""
    if num_docs < 2:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    sa = np.asarray(sa)
    prev_rank = np.asarray(ranks)[sa - 1].astype(np.int32)
    sa_docs = np.asarray(doc_ids)[sa].astype(np.int32)
    is_mum, ell = multi_mum_scan(
        jnp.asarray(lcp, dtype=jnp.int32), jnp.asarray(sa_docs),
        jnp.asarray(prev_rank), num_docs, min_mum)
    mask = np.asarray(is_mum)
    pos = np.flatnonzero(mask).astype(np.int64)
    return np.asarray(ell)[pos].astype(np.int64), pos


# ---------------------------------------------------------------------------
# thresholds
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("num_segs",))
def _segmented_argmin(lcp: jnp.ndarray, seg_id: jnp.ndarray, num_segs: int
                      ) -> jnp.ndarray:
    """First position of the minimum lcp value within each segment."""
    big = jnp.iinfo(jnp.int32).max
    mins = jax.ops.segment_min(lcp, seg_id, num_segments=num_segs)
    pos = jnp.arange(lcp.shape[0], dtype=jnp.int32)
    cand = jnp.where(lcp == mins[seg_id], pos, big)
    return jax.ops.segment_min(cand, seg_id, num_segments=num_segs)


def compute_thresholds_jax(heads: np.ndarray, lens: np.ndarray, lcp: np.ndarray
                           ) -> np.ndarray:
    """Vectorized per-run thresholds (same contract as
    oracle.compute_thresholds: argmin of LCP over (prev c-run end, start],
    0 for the first c-run of each character)."""
    from colbwt_tpu.ops.oracle import normalize_heads

    heads = normalize_heads(heads)
    lens = np.asarray(lens, dtype=np.int64)
    r = heads.size
    starts = np.zeros(r, dtype=np.int64)
    starts[1:] = np.cumsum(lens[:-1])
    ends = starts + lens - 1
    thresholds = np.zeros(r, dtype=np.int64)
    lcp_j = jnp.asarray(lcp, dtype=jnp.int32)
    n = int(lens.sum())

    for c in np.unique(heads):
        runs_c = np.flatnonzero(heads == c)
        if runs_c.size < 2:
            continue
        # segment s covers ranks (ends[runs_c[s]] + 1) .. starts[runs_c[s+1]]
        lo = ends[runs_c[:-1]] + 1
        hi = starts[runs_c[1:]]          # inclusive
        # map every rank position to its segment (or to a waste segment)
        seg_bounds = np.empty(2 * lo.size, dtype=np.int64)
        seg_bounds[0::2] = lo
        seg_bounds[1::2] = hi + 1
        pos_seg = np.searchsorted(seg_bounds, np.arange(n), side="right")
        in_seg = pos_seg % 2 == 1
        seg_id = np.where(in_seg, pos_seg // 2, lo.size)  # waste bucket = lo.size
        arg = np.asarray(_segmented_argmin(
            lcp_j, jnp.asarray(seg_id, dtype=jnp.int32), lo.size + 1))[:lo.size]
        thresholds[runs_c[1:]] = arg
    return thresholds
