"""Native C++ engine/helpers vs the NumPy oracle (skipped if no toolchain)."""

import numpy as np
import pytest

from colbwt_tpu.io import native
from colbwt_tpu.ops import oracle as O
from tests.conftest import random_docs
from tests.test_query_xla import build_index, make_reads

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_native_query_matches_oracle(rng):
    base = bytes(rng.choice(list(b"ACGT"), 200).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    tbl, _ = build_index(docs)
    reads = make_reads(rng, docs, 16)
    pmls, cids = native.query_pml_serial(tbl, reads)
    for read, pml, cid in zip(reads, pmls, cids):
        ep, ec = O.query_pml_oracle(tbl, read)
        np.testing.assert_array_equal(pml, ep)
        np.testing.assert_array_equal(cid, ec)


def test_native_rle(rng):
    data = rng.integers(0, 4, 10000).astype(np.uint8)
    h, l = native.rle_encode(data)
    ho, lo = O.rle(data)
    np.testing.assert_array_equal(h, ho)
    np.testing.assert_array_equal(l, lo)


def test_native_kasai(rng):
    docs = random_docs(rng, 3, lo=50, hi=150)
    _, ranks, _ = O.concat_collection(docs)
    sa = O.suffix_array(ranks)
    np.testing.assert_array_equal(native.lcp_kasai(ranks, sa),
                                  O.lcp_kasai(ranks, sa))


def test_native_fasta_parse(rng, tmp_path):
    from colbwt_tpu.io.fasta import write_fasta, read_fasta, FastaRecord

    recs = [FastaRecord("a/1", bytes(rng.choice(list(b"ACGT"), 333).astype("uint8"))),
            FastaRecord("b", b"ACGT"),
            FastaRecord("empty", b""),
            FastaRecord("c_2", bytes(rng.choice(list(b"ACGT"), 77).astype("uint8")))]
    write_fasta(tmp_path / "x.fa", recs, width=50)
    got = native.parse_fasta_bytes((tmp_path / "x.fa").read_bytes())
    assert [(n, s) for n, s in got] == [(r.name, r.seq) for r in recs]
    # python reader agrees
    got2 = list(read_fasta(tmp_path / "x.fa"))
    assert [(r.name, r.seq) for r in got2] == [(r.name, r.seq) for r in recs]


def test_native_sais_matches_oracle(rng):
    for trial in range(6):
        docs = random_docs(rng, int(rng.integers(1, 5)), lo=10, hi=200)
        _, ranks, _ = O.concat_collection(docs)
        sa_o = O.suffix_array(ranks)
        sa_n = native.suffix_array_sais(ranks)
        np.testing.assert_array_equal(sa_n, sa_o, err_msg=f"trial {trial}")


def test_native_sais_repetitive():
    # heavy repetition stresses the LMS recursion
    docs = [b"ACGT" * 50, b"ACGT" * 50, b"AC" * 100, b"A" * 123, b"ACGTACGT" * 25]
    _, ranks, _ = O.concat_collection(docs)
    np.testing.assert_array_equal(native.suffix_array_sais(ranks),
                                  O.suffix_array(ranks))


def test_native_sais_scale(rng):
    # ~1MB pangenome-shaped input: agreement with prefix doubling
    base = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), 250_000)
    docs = []
    for _ in range(4):
        a = base.copy()
        i = rng.integers(0, a.size, 2500)
        a[i] = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), i.size)
        docs.append(a.tobytes())
    _, ranks, _ = O.concat_collection(docs)
    import time
    t0 = time.perf_counter()
    sa_n = native.suffix_array_sais(ranks)
    t_sais = time.perf_counter() - t0
    sa_o = O.suffix_array(ranks)
    np.testing.assert_array_equal(sa_n, sa_o)
    assert t_sais < 10.0, f"SA-IS too slow: {t_sais}s for 1MB"
