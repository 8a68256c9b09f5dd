"""Run splitting: bound verification + exact query invariance."""

import numpy as np
import pytest

from colbwt_tpu.models.index import ColPmlIndex
from colbwt_tpu.ops import oracle as O
from colbwt_tpu.ops import query_xla
from colbwt_tpu.ops.run_split import split_runs_bounded_ff, max_ff_span
from tests.conftest import random_docs
from tests.test_query_xla import build_index, make_reads


def test_split_achieves_bound(rng):
    base = bytes(rng.choice(list(b"ACGT"), 400).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    tbl, _ = build_index(docs)
    for k in (2, 4, 8):
        split = split_runs_bounded_ff(tbl, k)
        assert max_ff_span(split) <= k
        assert split.n == tbl.n
        assert int(split.length.sum()) == tbl.n
        # expansion stays modest (Nishimoto–Tabei: O(r) extra runs)
        assert split.r <= 3 * tbl.r


def test_split_preserves_bwt(rng):
    docs = random_docs(rng, 2, lo=50, hi=120)
    tbl, _ = build_index(docs)
    split = split_runs_bounded_ff(tbl, 2)
    np.testing.assert_array_equal(
        np.repeat(split.char, split.length), np.repeat(tbl.char, tbl.length))
    np.testing.assert_array_equal(
        np.repeat(np.asarray(split.col_id), split.length),
        np.repeat(np.asarray(tbl.col_id), tbl.length))


@pytest.mark.parametrize("k", [2, 4])
def test_split_query_invariance(rng, k):
    """PML/CID outputs must be byte-identical on split vs unsplit tables."""
    base = bytes(rng.choice(list(b"ACGT"), 250).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    tbl, index = build_index(docs)
    split_index = ColPmlIndex.build(tbl, ff_bound=k)
    assert split_index.ff_bound == k
    reads = make_reads(rng, docs, 16)
    p1, c1 = query_xla.query_batch(index, reads)          # while_loop path
    p2, c2 = query_xla.query_batch(split_index, reads)    # unrolled path
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(c1, c2):
        np.testing.assert_array_equal(a, b)


def test_split_index_save_load(tmp_path, rng):
    docs = random_docs(rng, 2, lo=60, hi=100)
    tbl, _ = build_index(docs)
    idx = ColPmlIndex.build(tbl, ff_bound=4)
    idx.save(tmp_path / "s.npz")
    loaded = ColPmlIndex.load(tmp_path / "s.npz")
    assert loaded.ff_bound == 4
    assert loaded.r == idx.r
