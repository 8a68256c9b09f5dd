"""Chunked construction (ops/construct_chunked, native/chunked.cpp) vs the
monolithic SA path: merged RLBWT, per-rank doc array, and BWT-derived LCP
must equal the SA-IS + Kasai ground truth on mixed-length collections."""

import numpy as np
import pytest

from colbwt_tpu.io import native
from colbwt_tpu.ops import construct_chunked as CC
from colbwt_tpu.ops import oracle as O

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def make_collection(rng, ndocs, lo=50, hi=400, alphabet=b"ACGT",
                    mutate_from=None):
    docs = []
    for _ in range(ndocs):
        m = int(rng.integers(lo, hi))
        if mutate_from is not None:
            a = np.frombuffer(mutate_from, dtype=np.uint8)[:m].copy()
            if a.size < m:
                a = np.concatenate(
                    [a, rng.choice(list(alphabet), m - a.size).astype("uint8")])
            pos = rng.integers(0, a.size, max(1, a.size // 50))
            a[pos] = rng.choice(list(alphabet), pos.size)
            docs.append(a.tobytes())
        else:
            docs.append(bytes(rng.choice(list(alphabet), m).astype("uint8")))
    return docs


def concat_with_terminators(docs):
    parts = []
    starts = [0]
    for d in docs:
        parts.append(np.frombuffer(d, dtype=np.uint8))
        parts.append(np.array([CC.TERMINATOR], dtype=np.uint8))
        starts.append(starts[-1] + len(d) + 1)
    return np.concatenate(parts), np.array(starts, dtype=np.int64)


def monolithic_truth(docs):
    text, ranks, doc_ids = O.concat_collection(docs)
    sa = O.suffix_array(ranks)
    lcp = O.lcp_kasai(ranks, sa)
    heads, lens = O.rle(O.bwt_from_sa(text, sa))
    doc_of = doc_ids[sa]
    return heads, lens, lcp, doc_of, sa, ranks


@pytest.mark.parametrize("ndocs,max_chunk", [(6, 500), (5, 10**9), (9, 200)])
def test_chunked_rlbwt_matches_monolithic(rng, ndocs, max_chunk):
    docs = make_collection(rng, ndocs)
    text, starts = concat_with_terminators(docs)
    h1, l1, doc1 = CC.build_rlbwt_chunked(text, starts, max_chunk)
    h2, l2, lcp2, doc2, *_ = monolithic_truth(docs)
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(doc1.astype(np.int64), doc2)


def test_chunked_rlbwt_similar_docs(rng):
    base = bytes(rng.choice(list(b"ACGT"), 600).astype("uint8"))
    docs = make_collection(rng, 8, lo=550, hi=650, mutate_from=base)
    text, starts = concat_with_terminators(docs)
    h1, l1, doc1 = CC.build_rlbwt_chunked(text, starts, 1500)
    h2, l2, lcp2, doc2, *_ = monolithic_truth(docs)
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(doc1.astype(np.int64), doc2)


def test_lcp_from_rlbwt_matches_kasai(rng):
    base = bytes(rng.choice(list(b"ACGT"), 500).astype("uint8"))
    docs = make_collection(rng, 7, lo=450, hi=550, mutate_from=base)
    h, l, lcp_true, *_ = monolithic_truth(docs)
    lcp = CC.lcp_chunked(h, l, len(docs))
    np.testing.assert_array_equal(lcp, lcp_true.astype(np.int32))


def test_lcp_from_rlbwt_random_text(rng):
    docs = make_collection(rng, 5, alphabet=b"ACGTN")
    h, l, lcp_true, *_ = monolithic_truth(docs)
    lcp = CC.lcp_chunked(h, l, len(docs))
    np.testing.assert_array_equal(lcp, lcp_true.astype(np.int32))


def test_run_change_matches_rank_adjacency(rng):
    docs = make_collection(rng, 6)
    h, l, _, _, sa, ranks = monolithic_truth(docs)
    rc = CC.run_change_from_runs(h, l)
    prev = ranks[sa - 1]
    truth = np.ones(ranks.size, dtype=np.uint8)
    truth[1:] = prev[1:] != prev[:-1]
    np.testing.assert_array_equal(rc, truth)


def test_end_to_end_index_from_chunked(rng):
    """Full index built from chunked-construction outputs equals the
    monolithic one: thresholds, MUMs, col-split, and queries all flow from
    (heads, lens, lcp, doc_of)."""
    base = bytes(rng.choice(list(b"ACGT"), 400).astype("uint8"))
    docs = make_collection(rng, 4, lo=380, hi=420, mutate_from=base)
    text, starts = concat_with_terminators(docs)

    h, l, doc_of = CC.build_rlbwt_chunked(text, starts, 900)
    lcp = CC.lcp_chunked(h, l, len(docs)).astype(np.int64)
    thr = O.compute_thresholds_fast(h, l, lcp)

    # monolithic reference
    _, ranks, doc_ids = O.concat_collection(docs)
    sa = O.suffix_array(ranks)
    lcp_m = O.lcp_kasai(ranks, sa)
    ml_m, mp_m = O.find_multi_mums(ranks, sa, lcp_m, doc_ids, len(docs), 30)
    thr_m = O.compute_thresholds_fast(h, l, lcp_m)
    np.testing.assert_array_equal(thr, thr_m)

    # MUM scan from chunked arrays (device path)
    from colbwt_tpu.ops import construct_jax as CJ

    rc = CC.run_change_from_runs(h, l)
    ml, mp = CJ.find_multi_mums_chunked(lcp.astype(np.int32),
                                        doc_of.astype(np.int32), rc,
                                        len(docs), 30)
    np.testing.assert_array_equal(np.sort(ml), np.sort(ml_m))
    np.testing.assert_array_equal(np.sort(mp), np.sort(mp_m))


def test_lcp_fuzz_many_shapes():
    """Fuzz LCP-from-RLBWT vs Kasai over varied collection shapes: tiny
    docs, tiny alphabets, high repetition, single doc, many docs."""
    rng = np.random.default_rng(0xFCE2)
    shapes = [
        dict(ndocs=1, lo=5, hi=40),
        dict(ndocs=2, lo=1, hi=6),
        dict(ndocs=12, lo=2, hi=9),
        dict(ndocs=4, lo=20, hi=60, alphabet=b"AB"),
        dict(ndocs=6, lo=30, hi=80, alphabet=b"A"),  # homopolymers
        dict(ndocs=5, lo=10, hi=200),
    ]
    for rep in range(6):
        for kw in shapes:
            docs = make_collection(rng, **kw)
            h, l, lcp_true, *_ = monolithic_truth(docs)
            lcp = CC.lcp_chunked(h, l, len(docs))
            np.testing.assert_array_equal(
                lcp, lcp_true.astype(np.int32),
                err_msg=f"shape {kw} rep {rep}")


def test_chunked_fuzz_many_shapes():
    rng = np.random.default_rng(0xFCE3)
    for rep in range(5):
        ndocs = int(rng.integers(2, 10))
        docs = make_collection(rng, ndocs, lo=3, hi=120)
        text, starts = concat_with_terminators(docs)
        max_chunk = int(rng.integers(50, 400))
        h1, l1, doc1 = CC.build_rlbwt_chunked(text, starts, max_chunk)
        h2, l2, _, doc2, *_ = monolithic_truth(docs)
        np.testing.assert_array_equal(h1, h2, err_msg=f"rep {rep}")
        np.testing.assert_array_equal(l1, l2, err_msg=f"rep {rep}")
        np.testing.assert_array_equal(doc1.astype(np.int64), doc2,
                                      err_msg=f"rep {rep}")


def test_pipeline_chunked_mode_matches_monolithic(rng, tmp_path):
    """build_pipeline(sa_mode='chunked') writes byte-identical stage
    artifacts and an equivalent index to the monolithic path."""
    from colbwt_tpu.io import write_fasta, FastaRecord
    from colbwt_tpu.pipeline import build_pipeline
    from colbwt_tpu.utils.config import ColBwtConfig

    base = bytes(rng.choice(list(b"ACGT"), 1200).astype("uint8"))
    docs = make_collection(rng, 4, lo=1100, hi=1300, mutate_from=base)
    for i, d in enumerate(docs):
        write_fasta(tmp_path / f"s{i}.fa", [FastaRecord("c", d)])
    fastas = [str(tmp_path / f"s{i}.fa") for i in range(4)]

    cfg_m = ColBwtConfig(min_mum=40, sa_mode="monolithic")
    im = build_pipeline(fastas, str(tmp_path / "mono"), cfg=cfg_m)
    cfg_c = ColBwtConfig(min_mum=40, sa_mode="chunked", chunk_chars=2000)
    ic = build_pipeline(fastas, str(tmp_path / "chunk"), cfg=cfg_c)

    for suffix in (".fa.bwt.heads", ".fa.bwt.len", ".fa.thr_pos",
                   ".fa.col_mums", ".fa.col_runs", ".fa.col_ids"):
        a = (tmp_path / ("mono" + suffix)).read_bytes()
        b = (tmp_path / ("chunk" + suffix)).read_bytes()
        assert a == b, f"artifact mismatch: {suffix}"
    np.testing.assert_array_equal(im.char, ic.char)
    np.testing.assert_array_equal(im.idx, ic.idx)
    np.testing.assert_array_equal(im.threshold, ic.threshold)
    np.testing.assert_array_equal(im.col_id, ic.col_id)


def test_chunked_resume_from_checkpoint(rng, tmp_path, monkeypatch):
    """A crash mid-build resumes after the last completed chunk (cache_dir
    checkpoints) and the resumed result equals the uninterrupted one."""
    docs = make_collection(rng, 9, lo=120, hi=260)
    text, starts = concat_with_terminators(docs)

    calls = {"n": 0}
    real = CC.native.bwt_merge_ranks

    def dying(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # die inside the THIRD chunk's merge
            raise RuntimeError("simulated crash")
        return real(*a, **kw)

    monkeypatch.setattr(CC.native, "bwt_merge_ranks", dying)
    with pytest.raises(RuntimeError):
        CC.build_rlbwt_chunked(text, starts, 400, log=None,
                               cache_dir=tmp_path)
    assert (tmp_path / "rlbwt_state.npz").exists()
    monkeypatch.setattr(CC.native, "bwt_merge_ranks", real)

    logs = []
    h1, l1, doc1 = CC.build_rlbwt_chunked(text, starts, 400,
                                          log=logs.append,
                                          cache_dir=tmp_path)
    assert any("resumed after chunk" in m for m in logs)
    assert not (tmp_path / "rlbwt_state.npz").exists()  # cleared when done
    h2, l2, doc2 = CC.build_rlbwt_chunked(text, starts, 400)
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(doc1, doc2)


def test_chunked_checkpoint_shape_mismatch_ignored(rng, tmp_path):
    """A checkpoint from a different chunking or collection is not resumed."""
    docs = make_collection(rng, 6, lo=100, hi=200)
    text, starts = concat_with_terminators(docs)
    CC.build_rlbwt_chunked(text, starts, 300, cache_dir=tmp_path)
    # plant a stale state file with wrong chunking params
    np.savez(tmp_path / "rlbwt_state.npz",
             heads=np.array([65], np.uint8), lens=np.array([1], np.int64),
             doc_of=np.array([0], np.uint16), n_a=1, next_ci=1,
             n_total=123, max_chunk_chars=999,
             seen=np.array([1, 65], np.int64))
    logs = []
    h1, l1, doc1 = CC.build_rlbwt_chunked(text, starts, 300,
                                          log=logs.append,
                                          cache_dir=tmp_path)
    assert not any("resumed" in m for m in logs)
    h2, l2, doc2 = CC.build_rlbwt_chunked(text, starts, 300)
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(l1, l2)


def test_chunked_legacy_checkpoint_without_fingerprint_discarded(
        rng, tmp_path):
    """A pre-fingerprint legacy state file whose shape params match is
    still discarded: a same-shape but different collection (regenerated
    SNPs) must not silently resume (round-5 review fix)."""
    docs = make_collection(rng, 6, lo=100, hi=200)
    text, starts = concat_with_terminators(docs)
    # plant junk state with MATCHING n_total/max_chunk_chars, no fingerprint
    np.savez(tmp_path / "rlbwt_state.npz",
             heads=np.array([65], np.uint8), lens=np.array([1], np.int64),
             doc_of=np.array([0], np.uint16), n_a=1, next_ci=1,
             n_total=int(text.size), max_chunk_chars=300,
             seen=np.array([1, 65], np.int64))
    logs = []
    h1, l1, doc1 = CC.build_rlbwt_chunked(text, starts, 300,
                                          log=logs.append,
                                          cache_dir=tmp_path)
    assert not any("resumed" in m for m in logs)
    assert any("missing or mismatched" in m for m in logs)
    h2, l2, doc2 = CC.build_rlbwt_chunked(text, starts, 300)
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(doc1, doc2)


def test_chunked_precomputed_fingerprint_passthrough(rng, tmp_path):
    """Passing the caller's precomputed fingerprint is equivalent to the
    internal CRC pass (build.py passes it to avoid CRCing the text twice)."""
    docs = make_collection(rng, 5, lo=80, hi=160)
    text, starts = concat_with_terminators(docs)
    fp = CC._input_fingerprint(text, starts, True)
    h1, l1, d1 = CC.build_rlbwt_chunked(text, starts, 250,
                                        cache_dir=tmp_path, fingerprint=fp)
    h2, l2, d2 = CC.build_rlbwt_chunked(text, starts, 250)
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(d1, d2)
