"""Differential tests: device construction ops vs the NumPy oracle."""

import numpy as np
import pytest

from colbwt_tpu.ops import construct_jax as CJ
from colbwt_tpu.ops import colsplit_jax as CS
from colbwt_tpu.ops import oracle as O
from tests.conftest import random_docs


def _pipeline(docs):
    text, ranks, doc_ids = O.concat_collection(docs)
    sa = O.suffix_array(ranks)
    lcp = O.lcp_kasai(ranks, sa)
    heads, lens = O.rle(O.bwt_from_sa(text, sa))
    return text, ranks, doc_ids, sa, lcp, heads, lens


def test_suffix_array_device_matches_oracle(rng):
    for trial in range(4):
        docs = random_docs(rng, int(rng.integers(1, 5)), lo=20, hi=150)
        _, ranks, _ = O.concat_collection(docs)
        sa_o = O.suffix_array(ranks)
        sa_j, _ = CJ.suffix_array_jax(ranks)
        np.testing.assert_array_equal(sa_j, sa_o)


def test_lcp_device_matches_oracle(rng):
    for trial in range(4):
        docs = random_docs(rng, 3, lo=30, hi=120)
        _, ranks, _ = O.concat_collection(docs)
        sa_j, _, pyramid = CJ.suffix_array_jax(ranks, with_pyramid=True)
        lcp_j = CJ.lcp_jax(ranks, sa_j, pyramid)
        lcp_o = O.lcp_kasai(ranks, np.asarray(sa_j))
        np.testing.assert_array_equal(lcp_j, lcp_o)


def test_lcp_repetitive_text(rng):
    # heavy repeats stress the lifting decomposition
    docs = [b"ACGT" * 30, b"ACGT" * 30 + b"A", b"ACGTACGT" * 15]
    _, ranks, _ = O.concat_collection(docs)
    sa_j, _, pyramid = CJ.suffix_array_jax(ranks, with_pyramid=True)
    lcp_j = CJ.lcp_jax(ranks, sa_j, pyramid)
    np.testing.assert_array_equal(lcp_j, O.lcp_kasai(ranks, np.asarray(sa_j)))


@pytest.mark.parametrize("n_docs", [2, 3, 5, 8])
def test_multi_mums_device_matches_oracle(rng, n_docs):
    base = bytes(rng.choice(list(b"ACGT"), 150).astype("uint8"))
    docs = random_docs(rng, n_docs, mutate_from=base)
    text, ranks, doc_ids, sa, lcp, heads, lens = _pipeline(docs)
    for min_mum in (4, 10):
        lo, po = O.find_multi_mums(ranks, sa, lcp, doc_ids, n_docs, min_mum)
        lj, pj = CJ.find_multi_mums_jax(ranks, sa, lcp, doc_ids, n_docs, min_mum)
        np.testing.assert_array_equal(pj, po)
        np.testing.assert_array_equal(lj, lo)


def test_thresholds_device_matches_oracle(rng):
    for trial in range(4):
        docs = random_docs(rng, 3, lo=40, hi=120)
        _, ranks, _, sa, lcp, heads, lens = _pipeline(docs)
        thr_o = O.compute_thresholds(heads, lens, lcp)
        thr_j = CJ.compute_thresholds_jax(heads, lens, lcp)
        np.testing.assert_array_equal(thr_j, thr_o)
        thr_f = O.compute_thresholds_fast(heads, lens, lcp)
        np.testing.assert_array_equal(thr_f, thr_o)


def test_thresholds_fast_clamped_lcp(rng):
    """compute_thresholds_fast clamps LCP values that overflow the packed
    key's value bits and re-fixes those segments exactly — force it with
    artificial huge LCPs."""
    heads = np.array([65, 66, 65, 66, 65], dtype=np.uint8)
    lens = np.array([2, 3, 2, 1, 2], dtype=np.int64)
    n = int(lens.sum())
    for trial in range(8):
        lcp = rng.integers(0, 2**62, size=n).astype(np.int64)
        thr_o = O.compute_thresholds(heads, lens, lcp)
        thr_f = O.compute_thresholds_fast(heads, lens, lcp)
        np.testing.assert_array_equal(thr_f, thr_o)


@pytest.mark.parametrize("mode,rate", [("tunnels", 1), ("tunnels", 3),
                                       ("all", 1), ("all", 2)])
def test_colsplit_device_matches_oracle(rng, mode, rate):
    base = bytes(rng.choice(list(b"ACGT"), 200).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    text, ranks, doc_ids, sa, lcp, heads, lens = _pipeline(docs)
    fl = O.build_fl_table(heads, lens)
    ml, mp = O.find_multi_mums(ranks, sa, lcp, doc_ids, 3, 6)
    assert ml.size > 0
    po, io_, ho = O.col_split_oracle(fl, ml, mp, 3, rate, mode)
    pj, ij, hj = CS.col_split_jax(fl, ml, mp, 3, rate, mode)
    np.testing.assert_array_equal(pj, po, err_msg="mark positions")
    np.testing.assert_array_equal(hj, ho, err_msg="mark heights")
    np.testing.assert_array_equal(ij, io_, err_msg="mark ids")
    if mode == "tunnels":
        # the host int64 walker (wide-n lane) matches too
        pn, in_, hn = CS.col_split_tunneled_numpy(fl, ml, mp, 3, rate)
    else:
        # the fragment-event walker (any-N All mode) matches too
        pn, in_, hn = CS.col_split_all_numpy(fl, ml, mp, 3, rate)
    np.testing.assert_array_equal(pn, po)
    np.testing.assert_array_equal(in_, io_)
    np.testing.assert_array_equal(hn, ho)


def test_colsplit_all_mode_large_n(rng):
    """All mode beyond the old 64-document cap: N=96 device == oracle."""
    base = bytes(rng.choice(list(b"ACGT"), 120).astype("uint8"))
    docs = []
    for _ in range(96):  # one SNP per copy so length-5 multi-MUMs survive N=96
        arr = bytearray(base)
        p = int(rng.integers(0, len(arr)))
        arr[p] = b"ACGT"[int(rng.integers(0, 4))]
        docs.append(bytes(arr))
    text, ranks, doc_ids, sa, lcp, heads, lens = _pipeline(docs)
    fl = O.build_fl_table(heads, lens)
    ml, mp = O.find_multi_mums(ranks, sa, lcp, doc_ids, 96, 5)
    assert ml.size > 0
    for rate in (1, 3):
        po, io_, ho = O.col_split_oracle(fl, ml, mp, 96, rate, "all")
        pj, ij, hj = CS.col_split_jax(fl, ml, mp, 96, rate, "all")
        np.testing.assert_array_equal(pj, po, err_msg="mark positions")
        np.testing.assert_array_equal(hj, ho, err_msg="mark heights")
        np.testing.assert_array_equal(ij, io_, err_msg="mark ids")


def test_colsplit_device_bucketing(rng):
    """Tiny step budget forces many buckets; results must be unchanged."""
    base = bytes(rng.choice(list(b"ACGT"), 300).astype("uint8"))
    docs = random_docs(rng, 4, mutate_from=base)
    text, ranks, doc_ids, sa, lcp, heads, lens = _pipeline(docs)
    fl = O.build_fl_table(heads, lens)
    ml, mp = O.find_multi_mums(ranks, sa, lcp, doc_ids, 4, 5)
    ref = CS.col_split_jax(fl, ml, mp, 4, 2, "tunnels")
    small = CS.col_split_jax(fl, ml, mp, 4, 2, "tunnels", step_budget=8)
    for a, b in zip(ref, small):
        np.testing.assert_array_equal(a, b)


def test_full_device_construction_equals_host(rng):
    """End-to-end: device-op pipeline == oracle pipeline, through col_runs."""
    base = bytes(rng.choice(list(b"ACGT"), 250).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    text, ranks, doc_ids = O.concat_collection(docs)

    sa_j, _, pyr = CJ.suffix_array_jax(ranks, with_pyramid=True)
    lcp_j = CJ.lcp_jax(ranks, sa_j, pyr)
    heads, lens = O.rle(O.bwt_from_sa(text, np.asarray(sa_j)))
    fl = O.build_fl_table(heads, lens)
    ml, mp = CJ.find_multi_mums_jax(ranks, sa_j, lcp_j, doc_ids, 3, 6)
    mpos, mids, mhts = CS.col_split_jax(fl, ml, mp, 3, 2, "tunnels")
    bits_j, ids_j = O.find_col_runs_oracle(mpos, mids, mhts, fl.l_heads, fl.n)
    thr_j = CJ.compute_thresholds_jax(heads, lens, lcp_j)

    # oracle pipeline
    sa_o = O.suffix_array(ranks)
    lcp_o = O.lcp_kasai(ranks, sa_o)
    ml_o, mp_o = O.find_multi_mums(ranks, sa_o, lcp_o, doc_ids, 3, 6)
    po, io_, ho = O.col_split_oracle(fl, ml_o, mp_o, 3, 2, "tunnels")
    bits_o, ids_o = O.find_col_runs_oracle(po, io_, ho, fl.l_heads, fl.n)

    np.testing.assert_array_equal(bits_j, bits_o)
    np.testing.assert_array_equal(ids_j, ids_o)
    np.testing.assert_array_equal(thr_j, O.compute_thresholds(heads, lens, lcp_o))


def test_multi_mums_many_documents(rng):
    """N > 64 documents (beyond the old bitmask limit): device scan must
    match the oracle's np.unique-based check."""
    base = bytes(rng.choice(list(b"ACGT"), 60).astype("uint8"))
    docs = random_docs(rng, 80, mutate_from=base)
    text, ranks, doc_ids = O.concat_collection(docs)
    sa = O.suffix_array(ranks)
    lcp = O.lcp_kasai(ranks, sa)
    lo, po = O.find_multi_mums(ranks, sa, lcp, doc_ids, 80, 4)
    lj, pj = CJ.find_multi_mums_jax(ranks, sa, lcp, doc_ids, 80, 4)
    np.testing.assert_array_equal(pj, po)
    np.testing.assert_array_equal(lj, lo)


def test_sliding_min_brute_force(rng):
    """van Herk two-cummin sliding min == brute-force window min, including
    windows hanging past the end (treated as +inf) and w > n."""
    import jax.numpy as jnp

    for n in [1, 2, 7, 64, 257]:
        for w in [1, 2, 3, 5, 8, 17, 64, 300]:
            x = rng.integers(-50, 50, n).astype(np.int32)
            got = np.asarray(CJ._sliding_min(jnp.asarray(x), w))
            ref = np.array([x[i:i + w].min() for i in range(n)], np.int32)
            np.testing.assert_array_equal(got, ref, err_msg=f"n={n} w={w}")


def test_multi_mums_planted_cores_high_n(rng):
    """Hundreds of documents sharing two conserved cores flanked by random
    arms: the device scan must find exactly those MUMs (exercises the van
    Herk sliding-min at window widths ~N)."""
    N = 400
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    core1 = rng.choice(ACGT, 40)
    core2 = rng.choice(ACGT, 25)
    docs = [np.concatenate([rng.choice(ACGT, 30), core1,
                            rng.choice(ACGT, 20), core2,
                            rng.choice(ACGT, 10)]).tobytes()
            for _ in range(N)]
    text, ranks, doc_ids = O.concat_collection(docs)
    sa = O.suffix_array(ranks)
    lcp = O.lcp_kasai(ranks, sa)
    lo, po = O.find_multi_mums(ranks, sa, lcp, doc_ids, N, 8)
    lj, pj = CJ.find_multi_mums_jax(ranks, sa, lcp, doc_ids, N, 8)
    np.testing.assert_array_equal(pj, po)
    np.testing.assert_array_equal(lj, lo)
    assert sorted(lo.tolist()) == [25, 40]


def test_colsplit_all_mode_planted_cores_n400(rng):
    """All-mode col-split at N=400 via the fragment-event walker — the
    regime the (T, M, N) device walk cannot reach — against the oracle."""
    N = 400
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    core1 = rng.choice(ACGT, 40)
    core2 = rng.choice(ACGT, 25)
    docs = [np.concatenate([rng.choice(ACGT, 30), core1,
                            rng.choice(ACGT, 20), core2,
                            rng.choice(ACGT, 10)]).tobytes()
            for _ in range(N)]
    text, ranks, doc_ids = O.concat_collection(docs)
    sa = O.suffix_array(ranks)
    lcp = O.lcp_kasai(ranks, sa)
    ml, mp = O.find_multi_mums(ranks, sa, lcp, doc_ids, N, 8)
    assert ml.size == 2
    heads, lens = O.rle(O.bwt_from_sa(text, sa))
    fl = O.build_fl_table(heads, lens)
    for rate in (1, 4):
        po, io_, ho = O.col_split_oracle(fl, ml, mp, N, rate, "all")
        pj, ij, hj = CS.col_split_jax(fl, ml, mp, N, rate, "all")
        np.testing.assert_array_equal(pj, po)
        np.testing.assert_array_equal(ij, io_)
        np.testing.assert_array_equal(hj, ho)
        # fragments split: heights must show real fragmentation, not all N
        assert (hj < N).any() or rate > 1


@pytest.mark.parametrize("chunk", [1 << 10, 777, 4096])
def test_chunked_scan_equals_full(rng, chunk):
    """The fixed-shape streamed scan (find_multi_mums_chunked) must equal the
    one-shot device scan across chunk boundaries, including chunk sizes that
    straddle MUM windows and a non-power-of-two chunk."""
    base = bytes(rng.choice(list(b"ACGT"), 700).astype("uint8"))
    docs = random_docs(rng, 12, mutate_from=base)
    text, ranks, doc_ids = O.concat_collection(docs)
    sa = O.suffix_array(ranks)
    lcp = O.lcp_kasai(ranks, sa)
    lo, po = CJ.find_multi_mums_jax(ranks, sa, lcp, doc_ids, 12, 5)

    prev_rank = ranks[sa - 1]
    sa_docs = doc_ids[sa].astype(np.int32)
    run_change = np.ones(sa.shape[0], dtype=np.uint8)
    run_change[1:] = prev_rank[1:] != prev_rank[:-1]
    lc, pc = CJ.find_multi_mums_chunked(lcp, sa_docs, run_change, 12, 5,
                                        chunk=chunk)
    np.testing.assert_array_equal(pc, po)
    np.testing.assert_array_equal(lc, lo)


def test_chunked_scan_planted_cores(rng):
    """Chunked scan on the high-N planted-core configuration (halo = 2N+2
    exceeds the chunk fraction, windows straddle many chunk boundaries)."""
    N = 150
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    core1 = rng.choice(ACGT, 40)
    core2 = rng.choice(ACGT, 25)
    docs = [np.concatenate([rng.choice(ACGT, 30), core1,
                            rng.choice(ACGT, 20), core2,
                            rng.choice(ACGT, 10)]).tobytes()
            for _ in range(N)]
    text, ranks, doc_ids = O.concat_collection(docs)
    sa = O.suffix_array(ranks)
    lcp = O.lcp_kasai(ranks, sa)
    lo, po = O.find_multi_mums(ranks, sa, lcp, doc_ids, N, 8)

    prev_rank = ranks[sa - 1]
    sa_docs = doc_ids[sa].astype(np.int32)
    run_change = np.ones(sa.shape[0], dtype=np.uint8)
    run_change[1:] = prev_rank[1:] != prev_rank[:-1]
    lc, pc = CJ.find_multi_mums_chunked(lcp, sa_docs, run_change, N, 8,
                                        chunk=2048)
    np.testing.assert_array_equal(pc, po)
    np.testing.assert_array_equal(lc, lo)
    assert sorted(lc.tolist()) == [25, 40]


def test_thresholds_fast_streamed_blocks():
    """The block-streamed thresholds (O(block + r) memory) match the
    oracle for every block size, including 1-position blocks that force a
    partial-minimum merge across every boundary — and the clamped lane."""
    rng = np.random.default_rng(77)
    for trial in range(40):
        r = int(rng.integers(2, 30))
        heads = rng.integers(2, 6, r).astype(np.uint8)
        lens = rng.integers(1, 7, r).astype(np.int64)
        n = int(lens.sum())
        hi = 2**61 if trial % 4 == 0 else 32
        lcp = rng.integers(0, hi, n).astype(np.int64)
        want = O.compute_thresholds(heads, lens, lcp)
        for block in (1, 2, 7, n // 2 + 1, 1 << 27):
            got = O.compute_thresholds_fast(heads, lens, lcp, block=block)
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"trial {trial} blk {block}")
