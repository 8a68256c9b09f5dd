"""Streaming query driver: byte-identical outputs to the one-shot pipeline,
strict input-order records, bounded batching, long reads interleaved."""

import numpy as np
import pytest

from colbwt_tpu.io import formats as F
from colbwt_tpu.io.fasta import (FastaRecord, read_fasta, stream_fasta,
                                 write_fasta)
from colbwt_tpu.io.pml_out import read_pml_cid_binary
from colbwt_tpu.ops import oracle as O
from colbwt_tpu.pipeline import build_pipeline, query_pipeline, query_stream
from colbwt_tpu.utils.config import ColBwtConfig
from tests.conftest import random_docs


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    rng = np.random.default_rng(0x5EED)
    tmp = tmp_path_factory.mktemp("stream")
    base = bytes(rng.choice(list(b"ACGT"), 600).astype("uint8"))
    docs = random_docs(rng, 2, mutate_from=base)
    for i, d in enumerate(docs):
        write_fasta(tmp / f"s{i}.fa", [FastaRecord(f"s{i}", d)])
    cfg = ColBwtConfig(min_mum=15)
    build_pipeline([str(tmp / "s0.fa"), str(tmp / "s1.fa")],
                   str(tmp / "idx"), cfg)
    return tmp, docs, rng


def _make_reads(tmp, docs, rng, path, n=300, with_long=0):
    reads = []
    for i in range(n):
        d = docs[int(rng.integers(0, len(docs)))]
        s = int(rng.integers(0, len(d) - 80))
        m = int(rng.integers(20, 80))
        reads.append(FastaRecord(f"r{i}", d[s:s + m]))
    for j in range(with_long):
        # interleave long reads mid-stream to exercise order preservation
        reads.insert(int(rng.integers(0, len(reads))),
                     FastaRecord(f"L{j}", docs[0][:540]))
    write_fasta(tmp / path, reads)
    return reads


def test_stream_matches_pipeline_bytes(built):
    tmp, docs, rng = built
    _make_reads(tmp, docs, rng, "reads.fa", n=300)
    cfg = ColBwtConfig(batch_size=64)
    query_pipeline(str(tmp / "idx"), str(tmp / "reads.fa"), cfg)
    ref_pml = (tmp / "reads.fa.split.pml.bin").read_bytes()
    ref_cid = (tmp / "reads.fa.split.cid.bin").read_bytes()
    stats = query_stream(str(tmp / "idx"), str(tmp / "reads.fa"), cfg)
    assert stats["reads"] == 300
    assert (tmp / "reads.fa.split.pml.bin").read_bytes() == ref_pml
    assert (tmp / "reads.fa.split.cid.bin").read_bytes() == ref_cid


def test_stream_with_interleaved_long_reads(built):
    tmp, docs, rng = built
    reads = _make_reads(tmp, docs, rng, "mixed.fa", n=120, with_long=3)
    cfg = ColBwtConfig(batch_size=32, long_read_len=128, long_read_chunk=64)
    query_stream(str(tmp / "idx"), str(tmp / "mixed.fa"), cfg)
    names, pmls = read_pml_cid_binary(tmp / "mixed.fa.split.pml.bin")
    _, cids = read_pml_cid_binary(tmp / "mixed.fa.split.cid.bin")
    assert names == [r.name for r in reads]  # strict input order

    heads, lens = F.read_rlbwt(tmp / "idx.fa")
    thr = F.read_thresholds_file(tmp / "idx.fa.thr_pos")
    bv = F.read_sdsl_bit_vector(tmp / "idx.fa.col_runs")
    ids = F.read_col_ids(tmp / "idx.fa.col_ids")
    tbl = O.build_col_pml(heads, lens, np.flatnonzero(bv),
                          ids.astype(np.int64), thr.astype(np.int64))
    for rec, pml, cid in zip(reads, pmls, cids):
        ep, ec = O.query_pml_oracle(tbl, rec.seq)
        np.testing.assert_array_equal(pml, ep, err_msg=rec.name)
        np.testing.assert_array_equal(cid, ec, err_msg=rec.name)


def test_stream_fasta_equals_read_fasta(built):
    tmp, docs, rng = built
    reads = _make_reads(tmp, docs, rng, "sf.fa", n=500)
    # tiny slabs force many carry/boundary splits
    got = list(stream_fasta(tmp / "sf.fa", chunk_bytes=256))
    want = list(read_fasta(tmp / "sf.fa"))
    assert [r.name for r in got] == [r.name for r in want]
    assert [r.seq for r in got] == [r.seq for r in want]
    assert [r.name for r in want] == [r.name for r in reads]


def test_stream_cli_flag(built):
    from colbwt_tpu.cli import main as cli_main

    tmp, docs, rng = built
    _make_reads(tmp, docs, rng, "cli.fa", n=40)
    rc = cli_main(["query", str(tmp / "idx"), "-p", str(tmp / "cli.fa"),
                   "--stream"])
    assert rc == 0
    names, pmls = read_pml_cid_binary(tmp / "cli.fa.split.pml.bin")
    assert len(names) == 40
