"""Oracle self-consistency: SA/LCP/BWT, LF/FL tables, round-trip inversion.

These validate the NumPy executable spec against naive brute force; every
device kernel is then differential-tested against the oracle.
"""

import numpy as np

from colbwt_tpu.ops import oracle as O
from tests.conftest import random_docs


def naive_suffix_array(ranks):
    n = len(ranks)
    suffixes = sorted(range(n), key=lambda i: list(ranks[i:]))
    return np.array(suffixes, dtype=np.int64)


def naive_lcp(ranks, sa):
    n = len(sa)
    lcp = np.zeros(n, dtype=np.int64)
    for i in range(1, n):
        a, b = sa[i - 1], sa[i]
        h = 0
        while a + h < n and b + h < n and ranks[a + h] == ranks[b + h]:
            h += 1
        lcp[i] = h
    return lcp


def test_suffix_array_vs_naive(rng):
    for trial in range(8):
        docs = random_docs(rng, int(rng.integers(1, 4)), lo=5, hi=40)
        text, ranks, _ = O.concat_collection(docs)
        sa = O.suffix_array(ranks)
        np.testing.assert_array_equal(sa, naive_suffix_array(ranks))


def test_lcp_vs_naive(rng):
    docs = random_docs(rng, 3, lo=20, hi=60)
    _, ranks, _ = O.concat_collection(docs)
    sa = O.suffix_array(ranks)
    np.testing.assert_array_equal(O.lcp_kasai(ranks, sa), naive_lcp(ranks, sa))


def test_lcp_stops_at_separators(rng):
    # identical documents: suffixes match only up to the separators
    docs = [b"ACGTACGT", b"ACGTACGT"]
    _, ranks, _ = O.concat_collection(docs)
    sa = O.suffix_array(ranks)
    lcp = O.lcp_kasai(ranks, sa)
    assert lcp.max() <= 8  # never across a separator


def test_bwt_rle_roundtrip(rng):
    docs = random_docs(rng, 2, lo=30, hi=80)
    text, ranks, _ = O.concat_collection(docs)
    sa = O.suffix_array(ranks)
    bwt = O.bwt_from_sa(text, sa)
    heads, lens = O.rle(bwt)
    np.testing.assert_array_equal(np.repeat(heads, lens), bwt)
    assert int(lens.sum()) == text.size


def _build_tables(docs):
    text, ranks, doc_ids = O.concat_collection(docs)
    sa = O.suffix_array(ranks)
    bwt = O.bwt_from_sa(text, sa)
    heads, lens = O.rle(bwt)
    return text, ranks, doc_ids, sa, bwt, heads, lens


def test_lf_is_true_lf_for_regular_chars(rng):
    """For non-separator rows, table LF must equal the textbook LF computed
    from the suffix array: LF(rank of suffix t) = rank of suffix t-1."""
    docs = random_docs(rng, 3, lo=20, hi=60)
    text, ranks, _, sa, bwt, heads, lens = _build_tables(docs)
    n = text.size
    inv = np.empty(n, dtype=np.int64)
    inv[sa] = np.arange(n)
    tbl = O.build_lf_table(heads, lens)
    starts = tbl.idx
    for q in range(n):
        interval = int(np.searchsorted(starts, q, side="right") - 1)
        offset = q - int(starts[interval])
        if tbl.char[interval] <= 1:
            continue  # separator rows are permuted within their bucket
        di, doff, pos = O.lf_step_idx(tbl, interval, offset)
        t = sa[q]  # suffix at rank q; BWT[q] = text[t-1]
        expect = inv[(t - 1) % n]
        assert pos == expect, f"LF mismatch at rank {q}"


def test_lf_is_bijection(rng):
    docs = random_docs(rng, 2, lo=20, hi=50)
    _, _, _, _, _, heads, lens = _build_tables(docs)
    tbl = O.build_lf_table(heads, lens)
    seen = set()
    for q in range(tbl.n):
        interval = int(np.searchsorted(tbl.idx, q, side="right") - 1)
        offset = q - int(tbl.idx[interval])
        _, _, pos = O.lf_step_idx(tbl, interval, offset)
        seen.add(pos)
    assert len(seen) == tbl.n


def test_invert_roundtrip_single_doc(rng):
    # LF walk from row 0 reconstructs the document reversed
    # (LF_table::invert semantics, include/ds/LF_table.hpp:229-244)
    doc = bytes(rng.choice(list(b"ACGT"), 50).astype("uint8"))
    _, _, _, _, _, heads, lens = _build_tables([doc])
    tbl = O.build_lf_table(heads, lens)
    assert O.invert(tbl) == doc[::-1]


def test_fl_decompress_roundtrip_single_doc(rng):
    doc = bytes(rng.choice(list(b"ACGT"), 60).astype("uint8"))
    _, _, _, _, _, heads, lens = _build_tables([doc])
    fl = O.build_fl_table(heads, lens)
    out = O.decompress(fl)
    assert out == doc


def test_fl_is_inverse_of_lf(rng):
    """FL must invert LF on every non-separator-involved rank position."""
    docs = random_docs(rng, 2, lo=20, hi=50)
    text, ranks, _, sa, bwt, heads, lens = _build_tables(docs)
    lf = O.build_lf_table(heads, lens)
    fl = O.build_fl_table(heads, lens)
    n = lf.n
    for q in range(n):
        li = int(np.searchsorted(lf.idx, q, side="right") - 1)
        lo = q - int(lf.idx[li])
        if lf.char[li] <= 1:
            continue
        _, _, p = O.lf_step_idx(lf, li, lo)
        # FL from rank p should return to rank q
        fi = int(np.searchsorted(fl.idx, p, side="right") - 1)
        fo = p - int(fl.idx[fi])
        if fl.char[fi] <= 1:
            continue
        di, doff = O.fl_step(fl, fi, fo)
        back = int(fl.idx[di]) + doff
        assert back == q


def test_fl_l_heads(rng):
    docs = random_docs(rng, 2, lo=20, hi=50)
    _, _, _, _, _, heads, lens = _build_tables(docs)
    fl = O.build_fl_table(heads, lens)
    starts = np.zeros(len(lens), dtype=np.int64)
    starts[1:] = np.cumsum(lens[:-1])
    np.testing.assert_array_equal(fl.l_heads, starts)
