"""Wide (n >= 2**31) engine: limb arithmetic vs the int64 oracle.

Real text at HPRC scale cannot be materialized in tests, but a move table
scaled by S is mathematically valid: multiplying every run length by S
multiplies all rank coordinates by S, so LF maps S-blocks to S-blocks and the
query recurrence is well-defined on the inflated position space.  The int64
NumPy oracle runs it directly; the wide engine must match exactly.
"""

import numpy as np
import pytest

from colbwt_tpu.models.index import MAX_WIDE_RUN_LEN, ColPmlIndex
from colbwt_tpu.ops import oracle as O
from colbwt_tpu.ops import query_fused, query_mega, query_mega_wide, query_xla
from colbwt_tpu.ops.run_split import split_runs_max_len
from tests.conftest import random_docs
from tests.test_query_xla import build_index, make_reads

SCALE = 2**23  # n ~ 750 * 2**23 ~ 6.3e9 > 2**31


def scale_table(tbl: O.LFTableArrays, s: int) -> O.LFTableArrays:
    out = O.build_lf_table(np.asarray(tbl.char),
                           np.asarray(tbl.length, dtype=np.int64) * s)
    out.col_id = tbl.col_id
    out.threshold = (None if tbl.threshold is None
                     else np.asarray(tbl.threshold, dtype=np.int64) * s)
    out.bwt_r = tbl.bwt_r
    return out


@pytest.fixture(scope="module")
def wide_setup():
    rng = np.random.default_rng(0xB16)
    base = bytes(rng.choice(list(b"ACGT"), 250).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    tbl, _ = build_index(docs)
    big = scale_table(tbl, SCALE)
    assert big.n > 2**31
    index = ColPmlIndex.build(big, ff_bound=2)
    return rng, docs, big, index


def test_wide_flag_and_dtypes(wide_setup):
    _, _, big, index = wide_setup
    assert index.wide
    assert index.idx.dtype == np.int64
    assert index.threshold.dtype == np.int64
    assert index.length.dtype == np.int32
    assert int(index.length.max()) <= MAX_WIDE_RUN_LEN


def test_wide_engine_matches_int64_oracle(wide_setup):
    rng, docs, big, index = wide_setup
    reads = make_reads(rng, docs, 16) + [b"NNNNN", b"A", b"XYACGT"]
    pmls, cids = query_mega_wide.query_batch(index, reads)
    for read, pml, cid in zip(reads, pmls, cids):
        ep, ec = O.query_pml_oracle(big, read)
        np.testing.assert_array_equal(pml, ep, err_msg=f"PML {read!r}")
        np.testing.assert_array_equal(cid, ec, err_msg=f"CID {read!r}")


def test_wide_long_reads_chunked_equal_single(wide_setup):
    rng, docs, big, index = wide_setup
    reads = [docs[0] * 3, docs[1][:100], bytes(
        rng.choice(list(b"ACGTN"), 500).astype("uint8"))]
    p1, c1 = query_mega_wide.query_batch(index, reads)
    p2, c2 = query_mega_wide.query_long_reads(index, reads, chunk=64)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(c1, c2):
        np.testing.assert_array_equal(a, b)


def test_wide_engine_on_narrow_index_matches_narrow(rng):
    """The limb engine is exact on ordinary tables too (lo limb = value)."""
    base = bytes(rng.choice(list(b"ACGT"), 200).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    tbl, _ = build_index(docs)
    index = ColPmlIndex.build(tbl, ff_bound=2)
    assert not index.wide
    reads = make_reads(rng, docs, 16)
    p1, c1 = query_mega.query_batch(index, reads)
    p2, c2 = query_mega_wide.query_batch(index, reads)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(c1, c2):
        np.testing.assert_array_equal(a, b)


def test_narrow_engines_reject_wide_index(wide_setup):
    _, _, _, index = wide_setup
    with pytest.raises(ValueError, match="query_mega_wide"):
        query_mega.build_mega_table(index)
    with pytest.raises(ValueError, match="query_mega_wide"):
        query_xla.index_device_arrays(index)
    with pytest.raises(ValueError, match="query_mega_wide"):
        query_fused.build_fused_tables(index)


def test_split_runs_max_len_preserves_semantics(rng):
    docs = random_docs(rng, 3, lo=60, hi=120)
    tbl, _ = build_index(docs)
    capped = split_runs_max_len(tbl, 4)
    assert int(np.max(capped.length)) <= 4
    assert int(np.sum(capped.length)) == tbl.n
    for read in make_reads(rng, docs, 8):
        ep, ec = O.query_pml_oracle(tbl, read)
        ap, ac = O.query_pml_oracle(capped, read)
        np.testing.assert_array_equal(ap, ep)
        np.testing.assert_array_equal(ac, ec)


def test_device_builder_matches_host_rows(wide_setup):
    """The on-device donated-buffer table build (no host mega
    materialization, no searchsorted — bounded fast-forward instead) must
    reproduce the host reference rows bit-for-bit."""
    _, _, _, index = wide_setup
    host = query_mega_wide.build_mega_rows_wide_host(index)
    mt = query_mega_wide.build_mega_table_wide(index, compact=False)
    np.testing.assert_array_equal(np.asarray(mt["mega"]), host)


def test_compact_layout_exact(wide_setup):
    rng, docs, big, index = wide_setup
    mt = query_mega_wide.build_mega_table_wide(index, compact=True)
    assert "shared" in mt and "percha" in mt
    reads = make_reads(rng, docs, 16) + [b"NNNNN", b"A", b"XYACGT"]
    pmls, cids = query_mega_wide.query_batch(index, reads, mt=mt)
    for read, pml, cid in zip(reads, pmls, cids):
        ep, ec = O.query_pml_oracle(big, read)
        np.testing.assert_array_equal(pml, ep, err_msg=f"PML {read!r}")
        np.testing.assert_array_equal(cid, ec, err_msg=f"CID {read!r}")
    # compact long-read path shares query_chunk_mega_wide
    p1, c1 = query_mega_wide.query_batch(index, [docs[0] * 2], mt=mt)
    p2, c2 = query_mega_wide.query_long_reads(index, [docs[0] * 2],
                                              chunk=64, mt=mt)
    np.testing.assert_array_equal(p1[0], p2[0])
    np.testing.assert_array_equal(c1[0], c2[0])


def test_compact_auto_selection(wide_setup):
    _, _, _, index = wide_setup
    full = query_mega_wide.wide_table_bytes(index, compact=False)
    compact = query_mega_wide.wide_table_bytes(index, compact=True)
    assert compact < full
    mt = query_mega_wide.build_mega_table_wide(index,
                                               hbm_budget_bytes=full)
    assert "mega" in mt
    mt = query_mega_wide.build_mega_table_wide(index,
                                               hbm_budget_bytes=full - 1)
    assert "shared" in mt


def test_wide_packed_out_matches_unpacked(wide_setup):
    """packed_out (u16 at M <= 255, int32 above) must be a lossless
    re-encoding of the two-plane outputs, and uint8 pattern uploads must
    not change results (the slim transfer scheme of engines.dispatch)."""
    import jax.numpy as jnp

    from colbwt_tpu.ops.query_pos import unpack_pml_cid

    rng, docs, big, index = wide_setup
    reads = make_reads(rng, docs, 8)
    mt = query_mega_wide.build_mega_table_wide(index)
    for M in (64, 300):
        enc, lens = index.encode_patterns(reads, max_len=M)
        p0, c0 = query_mega_wide.query_batch_mega_wide(
            mt, jnp.asarray(enc), jnp.asarray(lens),
            ff_bound=index.ff_bound)
        pk, none = query_mega_wide.query_batch_mega_wide(
            mt, jnp.asarray(enc.astype(np.uint8)), jnp.asarray(lens),
            ff_bound=index.ff_bound, packed_out=True)
        assert none is None
        assert pk.dtype == (jnp.uint16 if M <= 255 else jnp.int32)
        p1, c1 = unpack_pml_cid(np.asarray(pk))
        np.testing.assert_array_equal(np.asarray(p0), p1)
        np.testing.assert_array_equal(np.asarray(c0), c1)
