"""Rank/select RLBWT (r_index representation) vs brute force and move tables."""

import numpy as np
import pytest

from colbwt_tpu.ops import oracle as O
from colbwt_tpu.ops.rindex import RIndex, RankSelectRLBWT
from tests.conftest import random_docs


@pytest.fixture
def built(rng):
    docs = random_docs(rng, 3, lo=50, hi=150)
    text, ranks, _ = O.concat_collection(docs)
    sa = O.suffix_array(ranks)
    bwt = O.bwt_from_sa(text, sa)
    bwt_norm = bwt.copy()
    bwt_norm[bwt_norm <= 1] = 1
    heads, lens = O.rle(bwt)
    return docs, text, bwt_norm, heads, lens


def test_rank_select_brute_force(built, rng):
    _, _, bwt, heads, lens = built
    rs = RankSelectRLBWT.from_rlbwt(heads, lens)
    for c in np.unique(bwt):
        c = int(c)
        occ = np.flatnonzero(bwt == c)
        # rank at every position 0..n
        idxs = np.arange(rs.n + 1)
        expect = np.r_[0, np.cumsum(bwt == c)]
        np.testing.assert_array_equal(rs.rank(idxs, c), expect)
        # select of every occurrence
        np.testing.assert_array_equal(rs.select(np.arange(occ.size), c), occ)
    np.testing.assert_array_equal(rs.char_at(np.arange(rs.n)), bwt)


def test_lf_fl_match_move_tables(built):
    _, _, _, heads, lens = built
    ri = RIndex.from_rlbwt(heads, lens)
    lf_tbl = O.build_lf_table(heads, lens)
    fl_tbl = O.build_fl_table(heads, lens)
    n = ri.n
    pos = np.arange(n)
    # LF by rank == LF by move table, at every position
    expect_lf = np.empty(n, dtype=np.int64)
    for run in range(lf_tbl.r):
        s = int(lf_tbl.idx[run])
        ln = int(lf_tbl.length[run])
        di, doff = int(lf_tbl.dest_interval[run]), int(lf_tbl.dest_offset[run])
        expect_lf[s:s + ln] = int(lf_tbl.idx[di]) + doff + np.arange(ln)
    np.testing.assert_array_equal(ri.LF(pos), expect_lf)
    # FL by select is LF's inverse
    np.testing.assert_array_equal(ri.FL(expect_lf), pos)
    # and matches the FL move table stepped from every F position
    got = ri.FL(pos[:64])
    for i in range(64):
        interval = int(np.searchsorted(fl_tbl.idx, i, side="right") - 1)
        off = i - int(fl_tbl.idx[interval])
        di, doff = O.fl_step(fl_tbl, interval, off)
        assert int(got[i]) == int(fl_tbl.idx[di]) + doff


def test_count_backward_search(built, rng):
    docs, text, _, heads, lens = built
    ri = RIndex.from_rlbwt(heads, lens)
    blob = b"".join(docs)
    for _ in range(20):
        d = docs[int(rng.integers(0, len(docs)))]
        m = int(rng.integers(3, 12))
        s = int(rng.integers(0, max(1, len(d) - m)))
        pat = d[s:s + m]
        expect = 0
        for dd in docs:  # occurrences within documents (no separator spans)
            start = 0
            while True:
                j = dd.find(pat, start)
                if j < 0:
                    break
                expect += 1
                start = j + 1
        assert ri.count(pat) == expect, pat
    assert ri.count(b"ACGT" * 40) == 0
    assert ri.count(b"\x02\x03") == 0  # absent chars


def test_invert_roundtrip(built):
    docs, _, _, heads, lens = built
    ri = RIndex.from_rlbwt(heads, lens)
    # LF walk from rank 0 regenerates the concatenation reversed-rotated the
    # same way LF_table::invert does: compare against the move-table oracle
    lf_tbl = O.build_lf_table(heads, lens)
    assert ri.invert() == O.invert(lf_tbl)


def test_save_load(built, tmp_path):
    _, _, _, heads, lens = built
    ri = RIndex.from_rlbwt(heads, lens)
    ri.save(tmp_path / "ri.npz")
    ri2 = RIndex.load(tmp_path / "ri.npz")
    assert ri2.count(b"ACG") == ri.count(b"ACG")
    np.testing.assert_array_equal(ri2.F, ri.F)
