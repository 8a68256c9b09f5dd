"""Algorithm-level oracle validation: multi-MUMs, thresholds, col-split,
and the PML query recurrence — each against an independent brute-force check.
"""

import numpy as np
import pytest

from colbwt_tpu.ops import oracle as O
from tests.conftest import random_docs


def brute_force_multi_mums(docs, min_mum):
    """O(n^3)-ish direct definition: substrings occurring exactly once in every
    document, maximal in both directions."""
    N = len(docs)
    found = {}
    d0 = docs[0]
    for i in range(len(d0)):
        for j in range(i + min_mum, len(d0) + 1):
            sub = d0[i:j]
            occs = []
            ok = True
            for d in docs:
                # overlapping occurrence count (bytes.count is non-overlapping)
                hits = [k for k in range(len(d) - len(sub) + 1)
                        if d[k:k + len(sub)] == sub]
                if len(hits) != 1:
                    ok = False
                    break
                occs.append(hits[0])
            if not ok:
                continue
            # left-maximal: not all occurrences preceded by the same char
            lefts = {d[o - 1] if o > 0 else ("^", k)
                     for k, (d, o) in enumerate(zip(docs, occs))}
            if len(lefts) == 1 and not isinstance(next(iter(lefts)), tuple):
                continue
            # right-maximal: not all followed by same char
            rights = {d[o + len(sub)] if o + len(sub) < len(d) else ("$", k)
                      for k, (d, o) in enumerate(zip(docs, occs))}
            if len(rights) == 1 and not isinstance(next(iter(rights)), tuple):
                continue
            found[sub] = len(sub)
    return set(found)


def _pipeline(docs):
    text, ranks, doc_ids = O.concat_collection(docs)
    sa = O.suffix_array(ranks)
    lcp = O.lcp_kasai(ranks, sa)
    bwt = O.bwt_from_sa(text, sa)
    heads, lens = O.rle(bwt)
    return text, ranks, doc_ids, sa, lcp, bwt, heads, lens


def test_multi_mums_vs_brute_force(rng):
    for trial in range(5):
        base = bytes(rng.choice(list(b"ACGT"), 60).astype("uint8"))
        docs = random_docs(rng, 3, mutate_from=base)
        text, ranks, doc_ids, sa, lcp, *_ = _pipeline(docs)
        lens_, pos_ = O.find_multi_mums(ranks, sa, lcp, doc_ids, len(docs), min_mum=4)
        got = set()
        for l, p in zip(lens_, pos_):
            start = sa[p]
            got.add(bytes(text[start:start + l]))
        expect = brute_force_multi_mums(docs, 4)
        assert got == expect, f"trial {trial}: got {got} expect {expect}"


def test_multi_mums_positions_have_full_height(rng):
    base = bytes(rng.choice(list(b"ACGT"), 80).astype("uint8"))
    docs = random_docs(rng, 4, mutate_from=base)
    text, ranks, doc_ids, sa, lcp, *_ = _pipeline(docs)
    lens_, pos_ = O.find_multi_mums(ranks, sa, lcp, doc_ids, len(docs), min_mum=4)
    assert np.all(np.diff(pos_) >= 1)  # sorted
    N = len(docs)
    for l, p in zip(lens_, pos_):
        window_docs = doc_ids[sa[p:p + N]]
        assert sorted(window_docs.tolist()) == list(range(N))


def lce_rank(lcp, a, b):
    """LCE of suffixes at ranks a < b: min lcp (a, b]."""
    if a > b:
        a, b = b, a
    if a == b:
        return 10 ** 9
    return int(lcp[a + 1:b + 1].min())


def test_thresholds_optimal_repositioning(rng):
    """The threshold decision must pick the side with the larger LCE:
    for every run gap position pos strictly between a c-run end e and the next
    c-run start s: (pos < thr) iff LCE(e,pos) >= LCE(pos,s) (ties either way
    are accepted: assert chosen side is >= the other)."""
    docs = random_docs(rng, 2, lo=40, hi=90)
    text, ranks, doc_ids, sa, lcp, bwt, heads, lens = _pipeline(docs)
    thr = O.compute_thresholds(heads, lens, lcp)
    starts = np.zeros(len(lens), dtype=np.int64)
    starts[1:] = np.cumsum(lens[:-1])
    ends = starts + lens - 1
    r = len(heads)
    for i in range(1, r):
        c = heads[i]
        # previous run of char c
        prev = None
        for j in range(i - 1, -1, -1):
            if heads[j] == c:
                prev = j
                break
        if prev is None:
            assert thr[i] == 0
            continue
        e, s = int(ends[prev]), int(starts[i])
        t = int(thr[i])
        assert e < t <= s
        for pos in range(e + 1, s):
            lce_pred = lce_rank(lcp, e, pos)
            lce_succ = lce_rank(lcp, pos, s)
            if pos < t:
                assert lce_pred >= lce_succ, (i, pos)
            else:
                assert lce_succ >= lce_pred, (i, pos)


def _full_index(docs, mode="tunnels", split_rate=2, min_mum=4):
    text, ranks, doc_ids, sa, lcp, bwt, heads, lens = _pipeline(docs)
    fl = O.build_fl_table(heads, lens)
    mum_lens, mum_pos = O.find_multi_mums(ranks, sa, lcp, doc_ids, len(docs), min_mum)
    mpos, mids, mhts = O.col_split_oracle(fl, mum_lens, mum_pos, len(docs),
                                          split_rate, mode)
    bits, ids = O.find_col_runs_oracle(mpos, mids, mhts, fl.l_heads, fl.n)
    thr = O.compute_thresholds(heads, lens, lcp)
    tbl = O.build_col_pml(heads, lens, bits, ids, thr)
    return text, ranks, sa, lcp, tbl, (mpos, mids, mhts, bits, ids)


def test_col_split_marks_structure(rng):
    base = bytes(rng.choice(list(b"ACGT"), 70).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    text, ranks, sa, lcp, tbl, (mpos, mids, mhts, bits, ids) = _full_index(docs)
    n = tbl.n
    assert np.all(mpos >= 0) and np.all(mpos < n)
    assert np.all(mhts >= 1) and np.all(mhts <= len(docs))
    # col_runs includes every BWT run head (find_col_runs flushes all heads)
    if bits.size:
        _, _, _, _, _, bwt, heads, lens = (*_pipeline(docs),)
        starts = np.zeros(len(lens), dtype=np.int64)
        starts[1:] = np.cumsum(lens[:-1])
        assert set(starts.tolist()) <= set(bits.tolist())
        assert bits.size == ids.size
        assert np.all(np.diff(bits) > 0)


def test_query_pml_match_invariant(rng):
    """After each query step, the tracked rank position's suffix must match
    the already-matched pattern suffix: text[SA[pos] : SA[pos]+len] ==
    pattern[j : j+len].  Independent of the move-table representation."""
    base = bytes(rng.choice(list(b"ACGT"), 80).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    text, ranks, sa, lcp, tbl, _ = _full_index(docs)

    for _ in range(10):
        m = int(rng.integers(5, 40))
        if rng.random() < 0.5:
            start = int(rng.integers(0, len(docs[0]) - m))
            pattern = docs[0][start:start + m]
        else:
            pattern = bytes(rng.choice(list(b"ACGT"), m).astype("uint8"))

        pml, cid = O.query_pml_oracle(tbl, pattern)
        # re-run the loop, checking the invariant at every step
        pos = tbl.n - 1
        interval = tbl.r - 1
        offset = tbl.get_length(interval) - 1
        length = 0
        for i in range(m):
            j = m - 1 - i
            c = pattern[j]
            if int(tbl.char[interval]) == c:
                length += 1
            else:
                length = 0
                interval, offset = O._threshold_step(tbl, interval, offset, pos, c)
            assert pml[j] == length
            interval, offset, pos = O.lf_step_idx(tbl, interval, offset)
            if length > 0:
                t = sa[pos]
                matched = bytes(text[t:t + length])
                assert matched == pattern[j:j + length], (
                    f"invariant broken at j={j}: {matched} != {pattern[j:j+length]}")


def test_query_pml_bounded_by_matching_statistics(rng):
    """pml[j] counts a real match P[j:j+pml[j]) present in the text (by the
    step invariant), so it is bounded by the true matching statistic; and for
    an exact substring the threshold repositioning must get a long ramp going
    (resets are allowed — PML is *pseudo* ML, the tracked occurrence may
    diverge, exactly as in the reference recurrence)."""
    base = bytes(rng.choice(list(b"ACGT"), 100).astype("uint8"))
    docs = random_docs(rng, 2, mutate_from=base)
    text, ranks, sa, lcp, tbl, _ = _full_index(docs)
    m = 20
    start = 10
    pattern = docs[1][start:start + m]
    pml, cid = O.query_pml_oracle(tbl, pattern)

    body = bytes(text.tobytes())
    for j in range(m):
        # matching statistic: longest prefix of P[j:] occurring in the text
        ms = 0
        while j + ms < m and pattern[j:j + ms + 1] in body:
            ms += 1
        assert pml[j] <= ms
    assert pml.max() >= m // 2, f"threshold repositioning too weak: {pml}"
    assert pml[0] >= 1


def test_no_mum_collection_builds_and_queries(rng):
    """Unrelated documents yield zero multi-MUMs; the index must still build
    (empty split set) and queries return all-zero CIDs."""
    d1 = bytes(rng.choice(list(b"ACGT"), 100).astype("uint8"))
    d2 = bytes(rng.choice(list(b"ACGT"), 100).astype("uint8"))
    text, ranks, sa, lcp, tbl, (mpos, *_rest) = _full_index([d1, d2], min_mum=50)
    assert mpos.size == 0
    pml, cid = O.query_pml_oracle(tbl, d1[10:40])
    assert (cid == 0).all()
    assert pml.max() > 0


def test_query_cid_marks_conserved_regions(rng):
    """Reads drawn from inside a long multi-MUM should see nonzero CIDs."""
    base = bytes(rng.choice(list(b"ACGT"), 120).astype("uint8"))
    # identical docs except one SNP at the end => giant shared MUM
    docs = [base + b"A", base + b"C", base + b"G"]
    text, ranks, sa, lcp, tbl, (mpos, mids, mhts, bits, ids) = _full_index(
        docs, split_rate=1, min_mum=10)
    assert mpos.size > 0, "expected at least one multi-MUM"
    pattern = base[30:80]
    pml, cid = O.query_pml_oracle(tbl, pattern)
    assert (cid > 0).any(), "expected nonzero chain statistics inside a MUM"
