"""Distributed orchestration helpers (single-process path) + index stats."""

import numpy as np

from colbwt_tpu.io.pml_out import read_pml_cid_binary
from colbwt_tpu.models.index import ColPmlIndex
from colbwt_tpu.ops import query_mega
from colbwt_tpu.parallel.distributed import (distributed_query,
                                             host_read_slice,
                                             merge_part_files)
from tests.conftest import random_docs
from tests.test_query_xla import build_index, make_reads


def test_host_read_slice_partitions():
    for total in (0, 1, 7, 64, 100):
        for nproc in (1, 2, 3, 8):
            slices = [host_read_slice(total, p, nproc) for p in range(nproc)]
            covered = []
            for lo, hi in slices:
                covered.extend(range(lo, hi))
            assert covered == list(range(total))


def test_merge_part_files(tmp_path):
    (tmp_path / "a").write_bytes(b"AAA")
    (tmp_path / "b").write_bytes(b"BB")
    merge_part_files(tmp_path / "out", [tmp_path / "a", tmp_path / "b"])
    assert (tmp_path / "out").read_bytes() == b"AAABB"


def test_distributed_query_single_process(tmp_path, rng):
    base = bytes(rng.choice(list(b"ACGT"), 200).astype("uint8"))
    docs = random_docs(rng, 2, mutate_from=base)
    tbl, _ = build_index(docs)
    index = ColPmlIndex.build(tbl, ff_bound=2)
    reads = make_reads(rng, docs, 10)
    names = [f"r{i}" for i in range(len(reads))]
    pattern_file = str(tmp_path / "p.fa")

    def qfn(batch):
        return query_mega.query_batch(index, batch)

    ln, lp, lc = distributed_query(index, pattern_file, names, reads, qfn)
    assert ln == names
    got_names, got_pmls = read_pml_cid_binary(f"{pattern_file}.split.pml.bin")
    assert got_names == names
    ref_p, _ = query_mega.query_batch(index, reads)
    for a, b in zip(got_pmls, ref_p):
        np.testing.assert_array_equal(a, np.clip(b, 0, 65535))


def test_index_stats(rng):
    docs = random_docs(rng, 2, lo=60, hi=120)
    tbl, index = build_index(docs)
    s = index.stats()
    assert s["n"] == tbl.n and s["r"] == index.r
    assert 0 <= s["col_char_fraction"] <= 1
    assert s["bytes_per_run"] > 0
