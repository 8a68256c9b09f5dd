"""Fused-gather engine: exact equality vs oracle and baseline engine."""

import numpy as np
import pytest

from colbwt_tpu.models.index import ColPmlIndex
from colbwt_tpu.ops import oracle as O
from colbwt_tpu.ops import query_fused, query_xla
from tests.conftest import random_docs
from tests.test_query_xla import build_index, make_reads


@pytest.mark.parametrize("mode,k", [("tunnels", 2), ("tunnels", 4), ("all", 4)])
def test_fused_matches_oracle(rng, mode, k):
    base = bytes(rng.choice(list(b"ACGT"), 250).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    tbl, _ = build_index(docs, mode=mode)
    index = ColPmlIndex.build(tbl, ff_bound=k)
    reads = make_reads(rng, docs, 24)
    pmls, cids = query_fused.query_batch(index, reads)
    for read, pml, cid in zip(reads, pmls, cids):
        ep, ec = O.query_pml_oracle(tbl, read)
        np.testing.assert_array_equal(pml, ep, err_msg=f"PML {read!r}")
        np.testing.assert_array_equal(cid, ec, err_msg=f"CID {read!r}")


def test_fused_matches_baseline_engine(rng):
    base = bytes(rng.choice(list(b"ACGT"), 300).astype("uint8"))
    docs = random_docs(rng, 4, mutate_from=base)
    tbl, _ = build_index(docs)
    index = ColPmlIndex.build(tbl, ff_bound=4)
    reads = make_reads(rng, docs, 40) + [b"NNNNN", b"XACGTX", b"A"]
    p1, c1 = query_xla.query_batch(index, reads)
    p2, c2 = query_fused.query_batch(index, reads)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(c1, c2):
        np.testing.assert_array_equal(a, b)


def test_fused_requires_split_index(rng):
    docs = random_docs(rng, 2, lo=50, hi=90)
    tbl, index = build_index(docs)  # unsplit (ff_bound=0)
    with pytest.raises(ValueError, match="run-split"):
        query_fused.query_batch(index, [b"ACGT"])


def test_fused_tables_reuse(rng):
    docs = random_docs(rng, 2, lo=60, hi=120)
    tbl, _ = build_index(docs)
    index = ColPmlIndex.build(tbl, ff_bound=4)
    ft = query_fused.build_fused_tables(index)
    reads = make_reads(rng, docs, 8)
    p1, c1 = query_fused.query_batch(index, reads, ft=ft)
    p2, c2 = query_fused.query_batch(index, reads)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)
