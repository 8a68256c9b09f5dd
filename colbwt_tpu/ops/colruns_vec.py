"""Vectorized find_col_runs for uniform interval heights (tunneled mode).

The reference's sweep (col_split::find_col_runs, include/col_split.hpp:258-338)
is a priority-queue scan.  In tunneled mode every marked interval has height
exactly N (the document count), so ends arrive in start order — the heap is a
FIFO and the whole sweep collapses into rank arithmetic:

- open(x) = #starts <= x  -  #ends <= x   (the live-interval count)
- a start claims ownership iff nothing was open before it and its id > 0
  (the reference's "push into empty heap" branch);
- an end transfers ownership iff exactly one interval remains open (its id is
  the last start <= that end — contiguity of the open window);
- an end closes coverage (id 0) iff nothing remains open and the next event
  lies strictly beyond it;
- BWT run heads are then interleaved: a head coinciding with a transition is
  consumed by it, otherwise it carries the id of the latest transition
  strictly before it (update_bwt_pos's last_id semantics).

Differential-tested for exact equality against the heapq oracle; the general
(mixed-height, All-mode) case stays on oracle.find_col_runs_oracle.
"""

from __future__ import annotations

import numpy as np


def find_col_runs_uniform(mark_pos: np.ndarray, mark_ids: np.ndarray,
                          height: int, l_heads: np.ndarray, n: int
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Exact vectorized equivalent of oracle.find_col_runs_oracle when every
    mark has the same height."""
    p = np.asarray(mark_pos, dtype=np.int64)
    ids = np.asarray(mark_ids, dtype=np.int64)
    if p.size == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    m = p.size
    e = p + height  # ends, strictly increasing like p

    # open-count before processing start i: intervals j < i with e_j > p_i
    # (the reference pops ends <= p_i before pushing start i)
    popped_before_start = np.searchsorted(e, p, side="right")  # e_j <= p_i
    open_before_start = np.arange(m) - np.minimum(popped_before_start,
                                                  np.arange(m))
    claim = (open_before_start == 0) & (ids > 0)

    # when end i is popped, the pop happens while processing the first start
    # k with p_k >= e_i (or the final flush); intervals open after the pop:
    # starts already pushed (j < k, i.e. p_j < e_i ... but pushes happen for
    # p_j <= current event; starts with p_j < e_i were pushed before e_i pops)
    # minus ends popped (j <= i).  Contiguity: open window is (i, last_pushed].
    last_pushed = np.searchsorted(p, e, side="left") - 1  # max j with p_j < e_i
    open_after_end = last_pushed - np.arange(m)
    pops = e <= n  # intervals running past n are never popped (final flush
    #                pops ends <= n only; include/col_split.hpp:336)
    transfer = pops & (open_after_end == 1)
    transfer_id = ids[np.minimum(last_pushed, m - 1)]

    # close: nothing open after, and the end lies strictly before the next
    # start (or before n for the trailing flush)
    next_start = np.full(m, n, dtype=np.int64)
    k = np.searchsorted(p, e, side="left")
    valid_next = k < m
    next_start[valid_next] = p[np.minimum(k, m - 1)][valid_next]
    close = pops & (open_after_end == 0) & (e < next_start)

    # transitions in sweep order: by position; at equal positions the
    # reference pops ends (<= idx) before pushing the start, so ends first
    t_pos = np.concatenate([p[claim], e[transfer], e[close]])
    t_id = np.concatenate([ids[claim], transfer_id[transfer],
                           np.zeros(int(close.sum()), dtype=np.int64)])
    t_kind = np.concatenate([np.ones(int(claim.sum()), dtype=np.int8),
                             np.zeros(int(transfer.sum()), dtype=np.int8),
                             np.zeros(int(close.sum()), dtype=np.int8)])
    order = np.lexsort((t_kind, t_pos))  # ends (kind 0) before starts (kind 1)
    t_pos = t_pos[order]
    t_id = t_id[order]

    # interleave BWT run heads (update_bwt_pos): heads coinciding with a
    # transition are consumed; others carry the id of the latest transition
    # strictly before them (last_id), 0 if none
    heads = np.asarray(l_heads, dtype=np.int64)
    consumed = np.isin(heads, t_pos)
    free_heads = heads[~consumed]
    j = np.searchsorted(t_pos, free_heads, side="left") - 1  # last transition < h
    head_ids = np.where(j >= 0, t_id[np.maximum(j, 0)], 0)

    bits = np.concatenate([t_pos, free_heads])
    out_ids = np.concatenate([t_id, head_ids])
    o = np.argsort(bits, kind="stable")
    return bits[o], out_ids[o]
