"""Vectorized uniform-height find_col_runs vs the heapq oracle."""

import numpy as np
import pytest

from colbwt_tpu.ops import oracle as O
from colbwt_tpu.ops.colruns_vec import find_col_runs_uniform
from tests.conftest import random_docs


def _compare(p, ids, N, heads, n):
    h = np.full(p.size, N, dtype=np.int64)
    b1, i1 = O.find_col_runs_oracle(p, ids, h, heads, n)
    b2, i2 = find_col_runs_uniform(p, ids, N, heads, n)
    np.testing.assert_array_equal(b2, b1)
    np.testing.assert_array_equal(i2, i1)


def test_uniform_sweep_random(rng):
    for trial in range(30):
        n = int(rng.integers(50, 400))
        N = int(rng.integers(2, 9))
        m = int(rng.integers(1, 40))
        p = np.sort(rng.choice(n, size=min(m, n), replace=False)).astype(np.int64)
        ids = rng.integers(0, 5, p.size).astype(np.int64)  # include id 0
        r = int(rng.integers(2, 30))
        heads = np.sort(rng.choice(n, size=min(r, n), replace=False)).astype(np.int64)
        if heads[0] != 0:
            heads[0] = 0
            heads = np.unique(heads)
        _compare(p, ids, N, heads, n)


def test_uniform_sweep_edges(rng):
    n = 100
    heads = np.array([0, 10, 50, 90], dtype=np.int64)
    # overlapping chains, ends beyond n, adjacent/touching intervals,
    # start == end of previous, zero ids
    cases = [
        (np.array([0, 3, 6]), np.array([1, 2, 3]), 4),       # chained overlap
        (np.array([95, 97]), np.array([1, 2]), 8),           # ends beyond n
        (np.array([5, 9]), np.array([1, 2]), 4),             # touching e==p
        (np.array([5, 9]), np.array([0, 0]), 4),             # all-zero ids
        (np.array([0]), np.array([7]), 100),                 # covers everything
        (np.array([42]), np.array([3]), 1),                  # unit interval
        (np.array([10, 12, 14, 40]), np.array([1, 0, 2, 3]), 6),
    ]
    for p, ids, N in cases:
        _compare(p.astype(np.int64), ids.astype(np.int64), N, heads, n)


def test_uniform_sweep_real_pipeline(rng):
    base = bytes(rng.choice(list(b"ACGT"), 400).astype("uint8"))
    docs = random_docs(rng, 4, mutate_from=base)
    text, ranks, doc_ids = O.concat_collection(docs)
    sa = O.suffix_array(ranks)
    lcp = O.lcp_kasai(ranks, sa)
    heads, lens = O.rle(O.bwt_from_sa(text, sa))
    fl = O.build_fl_table(heads, lens)
    ml, mp = O.find_multi_mums(ranks, sa, lcp, doc_ids, 4, 5)
    mpos, mids, mhts = O.col_split_oracle(fl, ml, mp, 4, 2, "tunnels")
    assert (mhts == 4).all()
    _compare(mpos, mids, 4, fl.l_heads, fl.n)
