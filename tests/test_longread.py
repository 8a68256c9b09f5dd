"""Long-read chunked streaming: chunked == unchunked == oracle."""

import numpy as np

from colbwt_tpu.models.index import ColPmlIndex
from colbwt_tpu.ops import oracle as O
from colbwt_tpu.ops import query_mega
from tests.conftest import random_docs
from tests.test_query_xla import build_index


def test_chunked_equals_unchunked(rng):
    base = bytes(rng.choice(list(b"ACGT"), 600).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    tbl, _ = build_index(docs)
    index = ColPmlIndex.build(tbl, ff_bound=2)
    # long reads spanning several chunks, mixed lengths
    reads = [docs[0][:550], docs[1][20:500], docs[2],
             bytes(rng.choice(list(b"ACGT"), 333).astype("uint8"))]
    p1, c1 = query_mega.query_long_reads(index, reads, chunk=64)
    p2, c2 = query_mega.query_batch(index, reads)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(c1, c2):
        np.testing.assert_array_equal(a, b)


def test_chunked_matches_oracle(rng):
    base = bytes(rng.choice(list(b"ACGT"), 400).astype("uint8"))
    docs = random_docs(rng, 2, mutate_from=base)
    tbl, _ = build_index(docs)
    index = ColPmlIndex.build(tbl, ff_bound=2)
    read = docs[0][:380]
    p, c = query_mega.query_long_reads(index, [read], chunk=50)
    ep, ec = O.query_pml_oracle(tbl, read)
    np.testing.assert_array_equal(p[0], ep)
    np.testing.assert_array_equal(c[0], ec)
