"""Differential tests: batched XLA query engine vs the NumPy oracle.

Exact equality is required on every read — the engine is a re-layout of the
reference recurrence, not an approximation (SURVEY §7 hard part 2: exact
tie-breaking semantics must survive vectorization).
"""

import numpy as np
import pytest

from colbwt_tpu.models.index import ColPmlIndex
from colbwt_tpu.ops import oracle as O
from colbwt_tpu.ops import query_xla
from tests.conftest import random_docs


def build_index(docs, min_mum=8, split_rate=2, mode="tunnels"):
    text, ranks, doc_ids = O.concat_collection(docs)
    sa = O.suffix_array(ranks)
    lcp = O.lcp_kasai(ranks, sa)
    heads, lens = O.rle(O.bwt_from_sa(text, sa))
    fl = O.build_fl_table(heads, lens)
    ml, mp = O.find_multi_mums(ranks, sa, lcp, doc_ids, len(docs), min_mum)
    mpos, mids, mhts = O.col_split_oracle(fl, ml, mp, len(docs), split_rate, mode)
    bits, ids = O.find_col_runs_oracle(mpos, mids, mhts, fl.l_heads, fl.n)
    thr = O.compute_thresholds(heads, lens, lcp)
    tbl = O.build_col_pml(heads, lens, bits, ids, thr)
    return tbl, ColPmlIndex.from_table(tbl)


def make_reads(rng, docs, count, lo=10, hi=60):
    reads = []
    for _ in range(count):
        m = int(rng.integers(lo, hi))
        if rng.random() < 0.6:
            d = docs[int(rng.integers(0, len(docs)))]
            s = int(rng.integers(0, max(1, len(d) - m)))
            reads.append(d[s:s + m])
        elif rng.random() < 0.5:
            reads.append(bytes(rng.choice(list(b"ACGT"), m).astype("uint8")))
        else:  # mutated substring
            d = docs[0]
            s = int(rng.integers(0, max(1, len(d) - m)))
            arr = bytearray(d[s:s + m])
            for _ in range(3):
                arr[int(rng.integers(0, len(arr)))] = int(rng.choice(list(b"ACGTN")))
            reads.append(bytes(arr))
    return reads


@pytest.mark.parametrize("mode", ["tunnels", "all"])
def test_xla_engine_matches_oracle(rng, mode):
    base = bytes(rng.choice(list(b"ACGT"), 200).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    tbl, index = build_index(docs, mode=mode)
    reads = make_reads(rng, docs, 32)
    pmls, cids = query_xla.query_batch(index, reads)
    for read, pml, cid in zip(reads, pmls, cids):
        e_pml, e_cid = O.query_pml_oracle(tbl, read)
        np.testing.assert_array_equal(pml, e_pml, err_msg=f"PML for {read!r}")
        np.testing.assert_array_equal(cid, e_cid, err_msg=f"CID for {read!r}")


def test_xla_engine_mixed_lengths_right_alignment(rng):
    base = bytes(rng.choice(list(b"ACGT"), 150).astype("uint8"))
    docs = random_docs(rng, 2, mutate_from=base)
    tbl, index = build_index(docs)
    reads = [docs[0][10:15], docs[1][20:80], b"A", docs[0][:120],
             b"NNNACGT", docs[1][5:6]]
    pmls, cids = query_xla.query_batch(index, reads, max_len=128)
    for read, pml, cid in zip(reads, pmls, cids):
        assert pml.size == len(read)
        e_pml, e_cid = O.query_pml_oracle(tbl, read)
        np.testing.assert_array_equal(pml, e_pml)
        np.testing.assert_array_equal(cid, e_cid)


def test_xla_engine_absent_chars(rng):
    docs = random_docs(rng, 2, lo=50, hi=90)
    tbl, index = build_index(docs)
    reads = [b"NNNNNNN", b"XYZXYZXYZ", b"ACGTNACGT"]
    pmls, cids = query_xla.query_batch(index, reads)
    for read, pml, cid in zip(reads, pmls, cids):
        e_pml, e_cid = O.query_pml_oracle(tbl, read)
        np.testing.assert_array_equal(pml, e_pml)
        np.testing.assert_array_equal(cid, e_cid)


def test_index_save_load_roundtrip(tmp_path, rng):
    docs = random_docs(rng, 2, lo=50, hi=90)
    tbl, index = build_index(docs)
    index.save(tmp_path / "idx.npz")
    loaded = ColPmlIndex.load(tmp_path / "idx.npz")
    reads = make_reads(rng, docs, 8)
    p1, c1 = query_xla.query_batch(index, reads)
    p2, c2 = query_xla.query_batch(loaded, reads)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(c1, c2):
        np.testing.assert_array_equal(a, b)


def test_jump_tables(rng):
    docs = random_docs(rng, 2, lo=40, hi=80)
    tbl, index = build_index(docs)
    r = index.r
    for ci in range(index.sigma):
        byte = int(index.alphabet[ci])
        for i in range(0, r, 7):
            p = O.pred_char(tbl, i, byte)
            s = O.succ_char(tbl, i, byte)
            assert index.pred_jump[ci, i] == (p[0] if p else -1)
            assert index.succ_jump[ci, i] == (s[0] if s else r)
