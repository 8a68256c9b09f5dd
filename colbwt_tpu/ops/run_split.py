"""Move-structure run splitting: bound the LF fast-forward at K steps.

The reference's LF walk (include/ds/LF_table.hpp:256-259) advances through
destination runs until the offset fits — unbounded in the worst case.  Movi
bounds it by Nishimoto–Tabei-style run splitting [inferred, SURVEY §2.2]: here
we split source runs until every run's LF image overlaps at most `k` runs, so
the device kernel can replace the data-dependent while-loop with k-1 statically
unrolled conditional advances (pure gathers, no dynamic control flow — the
XLA-friendly shape).

Splitting is semantics-preserving for the query recurrence: sub-runs inherit
char / col_id / threshold, pred/succ jump targets land on the same rank
coordinates (first/last piece boundaries coincide with the original run's),
and LF is the same function of rank positions.  Differential tests assert
exact output equality split vs unsplit.
"""

from __future__ import annotations

import numpy as np

from colbwt_tpu.ops.oracle import LFTableArrays, build_lf_table


def _lf_dest_positions(char: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Rank-coordinate LF destination start of each run (F start)."""
    f_order = np.argsort(char, kind="stable")
    f_start = np.zeros(char.size, dtype=np.int64)
    f_start[1:] = np.cumsum(lens[f_order][:-1])
    dest = np.empty(char.size, dtype=np.int64)
    dest[f_order] = f_start
    return dest


def split_runs_bounded_ff(tbl: LFTableArrays, k: int = 4, max_rounds: int = 64,
                          strict: bool = False) -> LFTableArrays:
    """Return a new LF table whose every run's LF image spans few runs,
    targeting <= k.

    Iterates: find violating runs, cut them at the pre-images of every k-th
    overlapped run boundary, rebuild.  Runs whose LF image overlaps
    *themselves* (long self-mapping repeats) can oscillate — each cut inserts
    a boundary into the run's own image — so exact k is not always reachable;
    after max_rounds the best achieved bound stands (query engines unroll to
    the *achieved* bound, read it back with max_ff_span).  strict=True raises
    instead."""
    if k < 1:
        raise ValueError("k must be >= 1")
    char = np.asarray(tbl.char, dtype=np.uint8)
    lens = np.asarray(tbl.length, dtype=np.int64)
    col_id = None if tbl.col_id is None else np.asarray(tbl.col_id)
    thr = None if tbl.threshold is None else np.asarray(tbl.threshold, dtype=np.int64)

    for _ in range(max_rounds):
        r = char.size
        starts = np.zeros(r, dtype=np.int64)
        starts[1:] = np.cumsum(lens[:-1])
        dest = _lf_dest_positions(char, lens)
        lo = np.searchsorted(starts, dest, side="right") - 1
        hi = np.searchsorted(starts, dest + lens - 1, side="right") - 1
        span = hi - lo + 1
        counts = np.maximum((span - 1) // k, 0)  # cuts per run
        bad = np.flatnonzero(counts > 0)
        if bad.size == 0:
            break

        # cut j of bad run i sits at image boundary starts[lo_i + k*j],
        # translated back to a source offset and then a source coordinate —
        # fully vectorized over all (run, cut) pairs
        c = counts[bad]
        rep = np.repeat(bad, c)
        jj = np.arange(rep.size, dtype=np.int64) - np.repeat(
            np.cumsum(c) - c, c) + 1
        cut_abs = starts[rep] + (starts[lo[rep] + k * jj] - dest[rep])

        bounds = np.concatenate([starts, cut_abs])
        bounds.sort(kind="stable")
        owner = np.searchsorted(starts, bounds, side="right") - 1
        n_total = int(lens.sum())
        new_lens = np.diff(np.r_[bounds, n_total])
        keep = new_lens > 0  # duplicates would appear only if a cut hit a start
        char = char[owner][keep]
        lens = new_lens[keep]
        if col_id is not None:
            col_id = col_id[owner][keep]
        if thr is not None:
            thr = thr[owner][keep]
    else:
        if strict:
            raise RuntimeError(f"run splitting did not converge to k={k}")

    out = build_lf_table(char, lens)
    out.col_id = col_id
    out.threshold = thr
    out.bwt_r = tbl.bwt_r
    return out


def split_runs_max_len(tbl: LFTableArrays, max_len: int) -> LFTableArrays:
    """Cut every run longer than max_len into <= max_len pieces.

    Needed by the wide (n >= 2**31) engines: intra-run offsets and
    destination offsets must fit one int32 limb (ops.query_mega_wide), so run
    lengths are capped at 2**29-class values.  Semantics-preserving for the
    same reason ff splitting is (sub-runs inherit char/col_id/threshold and
    LF is a function of rank positions).  Run AFTER this the ff-bound pass —
    ff cuts only shorten runs, so the cap survives; cap cuts can widen other
    runs' LF spans, which the ff pass then fixes.
    """
    if max_len < 1:
        raise ValueError("max_len must be >= 1")
    lens = np.asarray(tbl.length, dtype=np.int64)
    counts = (lens - 1) // max_len  # extra cuts per run
    bad = np.flatnonzero(counts > 0)
    if bad.size == 0:
        return tbl
    char = np.asarray(tbl.char, dtype=np.uint8)
    starts = np.zeros(char.size, dtype=np.int64)
    starts[1:] = np.cumsum(lens[:-1])
    c = counts[bad]
    rep = np.repeat(bad, c)
    jj = np.arange(rep.size, dtype=np.int64) - np.repeat(np.cumsum(c) - c, c) + 1
    cut_abs = starts[rep] + jj * max_len
    bounds = np.concatenate([starts, cut_abs])
    bounds.sort(kind="stable")
    owner = np.searchsorted(starts, bounds, side="right") - 1
    new_lens = np.diff(np.r_[bounds, int(lens.sum())])
    out = build_lf_table(char[owner], new_lens)
    out.col_id = None if tbl.col_id is None else np.asarray(tbl.col_id)[owner]
    out.threshold = (None if tbl.threshold is None
                     else np.asarray(tbl.threshold, dtype=np.int64)[owner])
    out.bwt_r = tbl.bwt_r
    return out


def max_ff_span(tbl: LFTableArrays) -> int:
    """Largest number of runs any run's LF image overlaps (the fast-forward
    bound actually achieved)."""
    char = np.asarray(tbl.char, dtype=np.uint8)
    lens = np.asarray(tbl.length, dtype=np.int64)
    starts = np.zeros(char.size, dtype=np.int64)
    starts[1:] = np.cumsum(lens[:-1])
    dest = _lf_dest_positions(char, lens)
    lo = np.searchsorted(starts, dest, side="right") - 1
    hi = np.searchsorted(starts, dest + lens - 1, side="right") - 1
    return int((hi - lo + 1).max(initial=1))
