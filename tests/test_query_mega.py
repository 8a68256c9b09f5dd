"""Mega engine: exact equality vs oracle + baseline engines."""

import numpy as np
import pytest

from colbwt_tpu.models.index import ColPmlIndex
from colbwt_tpu.ops import oracle as O
from colbwt_tpu.ops import query_mega, query_xla
from tests.conftest import random_docs
from tests.test_query_xla import build_index, make_reads


@pytest.mark.parametrize("mode", ["tunnels", "all"])
def test_mega_matches_oracle(rng, mode):
    base = bytes(rng.choice(list(b"ACGT"), 250).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    tbl, _ = build_index(docs, mode=mode)
    index = ColPmlIndex.build(tbl, ff_bound=2)
    reads = make_reads(rng, docs, 24) + [b"NNNNN", b"A", b"XYACGT"]
    pmls, cids = query_mega.query_batch(index, reads)
    for read, pml, cid in zip(reads, pmls, cids):
        ep, ec = O.query_pml_oracle(tbl, read)
        np.testing.assert_array_equal(pml, ep, err_msg=f"PML {read!r}")
        np.testing.assert_array_equal(cid, ec, err_msg=f"CID {read!r}")


def test_mega_matches_baseline(rng):
    base = bytes(rng.choice(list(b"ACGT"), 300).astype("uint8"))
    docs = random_docs(rng, 4, mutate_from=base)
    tbl, _ = build_index(docs)
    i2 = ColPmlIndex.build(tbl, ff_bound=2)
    i4 = ColPmlIndex.build(tbl, ff_bound=4)
    reads = make_reads(rng, docs, 32)
    p1, c1 = query_xla.query_batch(i4, reads)
    p2, c2 = query_mega.query_batch(i2, reads)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(c1, c2):
        np.testing.assert_array_equal(a, b)


def test_mega_rejects_unsplit_index(rng):
    docs = random_docs(rng, 2, lo=50, hi=90)
    tbl, unsplit = build_index(docs)  # from_table: ff_bound == 0
    with pytest.raises(ValueError, match="run-split"):
        query_mega.build_mega_table(unsplit)


def test_mega_packed_out_matches_unpacked(rng):
    """Slim-transfer packed plane is a lossless re-encoding (narrow mega)."""
    import jax.numpy as jnp

    from colbwt_tpu.models.index import ColPmlIndex
    from colbwt_tpu.ops import query_mega
    from colbwt_tpu.ops.query_pos import unpack_pml_cid
    from tests.test_query_xla import build_index, make_reads

    base = bytes(rng.choice(list(b"ACGT"), 300).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    tbl, _ = build_index(docs)
    index = ColPmlIndex.build(tbl, ff_bound=2)
    mt = query_mega.build_mega_table(index)
    reads = make_reads(rng, docs, 8)
    for M in (64, 300):
        enc, lens = index.encode_patterns(reads, max_len=M)
        p0, c0 = query_mega.query_batch_mega(
            mt, jnp.asarray(enc), jnp.asarray(lens), ff_bound=2)
        pk, none = query_mega.query_batch_mega(
            mt, jnp.asarray(enc.astype(np.uint8)), jnp.asarray(lens),
            ff_bound=2, packed_out=True)
        assert none is None
        assert pk.dtype == (jnp.uint16 if M <= 255 else jnp.int32)
        p1, c1 = unpack_pml_cid(np.asarray(pk))
        np.testing.assert_array_equal(np.asarray(p0), p1)
        np.testing.assert_array_equal(np.asarray(c0), c1)
