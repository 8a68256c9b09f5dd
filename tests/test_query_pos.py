"""Positional-automaton engine: exact equality vs oracle for every k."""

import numpy as np
import pytest

from colbwt_tpu.models.index import ColPmlIndex
from colbwt_tpu.ops import oracle as O
from colbwt_tpu.ops import query_pos
from tests.conftest import random_docs
from tests.test_query_xla import build_index, make_reads


@pytest.mark.parametrize("mode", ["tunnels", "all"])
@pytest.mark.parametrize("k", [1, 2, 3])
def test_pos_matches_oracle(rng, mode, k):
    base = bytes(rng.choice(list(b"ACGT"), 250).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    tbl, index = build_index(docs, mode=mode)  # unsplit: pos engine needs no ff
    reads = make_reads(rng, docs, 24) + [b"NNNNN", b"A", b"XYACGT"]
    pmls, cids = query_pos.query_batch(index, reads, k=k)
    for read, pml, cid in zip(reads, pmls, cids):
        ep, ec = O.query_pml_oracle(tbl, read)
        np.testing.assert_array_equal(pml, ep, err_msg=f"PML {read!r} k={k}")
        np.testing.assert_array_equal(cid, ec, err_msg=f"CID {read!r} k={k}")


def test_pos_long_reads_chunked_equals_batch(rng):
    base = bytes(rng.choice(list(b"ACGT"), 400).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    tbl, index = build_index(docs)
    reads = make_reads(rng, docs, 6, lo=90, hi=230)
    pt = query_pos.build_pos_tables(index, k=2)
    p1, c1 = query_pos.query_batch(index, reads, pt=pt)
    p2, c2 = query_pos.query_long_reads(index, reads, chunk=32, pt=pt)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(c1, c2):
        np.testing.assert_array_equal(a, b)


def test_pos_works_on_split_index_too(rng):
    """Run splitting is unnecessary for the pos engine but must not change
    results (positions are invariant under run splitting)."""
    docs = random_docs(rng, 2, lo=60, hi=120)
    tbl, _ = build_index(docs)
    split = ColPmlIndex.build(tbl, ff_bound=2)
    unsplit = ColPmlIndex.from_table(tbl)
    reads = make_reads(rng, docs, 12)
    p1, c1 = query_pos.query_batch(unsplit, reads, k=2)
    p2, c2 = query_pos.query_batch(split, reads, k=2)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(c1, c2):
        np.testing.assert_array_equal(a, b)


def test_choose_k_budgets(rng):
    docs = random_docs(rng, 2, lo=40, hi=80)
    _, index = build_index(docs)
    A = index.sigma + 1
    # exactly enough for k=2, not k=3
    budget = (A ** 2) * index.n * 8
    assert query_pos.choose_k(index, budget) == 2
    assert query_pos.choose_k(index, (A ** 3) * index.n * 8) == 3
    assert query_pos.choose_k(index, 8) == 0


@pytest.mark.parametrize("k", [1, 2, 3, 4])
def test_pos_restricted_alphabet_matches_oracle(rng, k):
    """ACGT-restricted keys; reads with other bytes take the k=1 fallback."""
    base = bytes(rng.choice(list(b"ACGT"), 250).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    tbl, index = build_index(docs)
    reads = make_reads(rng, docs, 16) + [b"NNNNN", b"ACGNACGT", b"A",
                                         docs[0][10:40] + b"X" + docs[0][40:70]]
    pmls, cids = query_pos.query_batch(index, reads, k=k, alphabet=b"ACGT")
    for read, pml, cid in zip(reads, pmls, cids):
        ep, ec = O.query_pml_oracle(tbl, read)
        np.testing.assert_array_equal(pml, ep, err_msg=f"PML {read!r} k={k}")
        np.testing.assert_array_equal(cid, ec, err_msg=f"CID {read!r} k={k}")


def test_pos_restricted_long_reads(rng):
    base = bytes(rng.choice(list(b"ACGT"), 400).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    tbl, index = build_index(docs)
    reads = make_reads(rng, docs, 5, lo=90, hi=230)
    reads.append(docs[0][0:100] + b"N" + docs[0][100:220])  # fallback lane
    pt = query_pos.build_pos_tables(index, k=3, alphabet=b"ACGT")
    p1, c1 = query_pos.query_batch(index, reads, pt=pt)
    p2, c2 = query_pos.query_long_reads(index, reads, chunk=32, pt=pt)
    for r, a, b in zip(reads, p1, p2):
        np.testing.assert_array_equal(a, b, err_msg=repr(r))
    for a, b in zip(c1, c2):
        np.testing.assert_array_equal(a, b)
    for read, pml, cid in zip(reads, p1, c1):
        ep, ec = O.query_pml_oracle(tbl, read)
        np.testing.assert_array_equal(pml, ep)
        np.testing.assert_array_equal(cid, ec)


def test_choose_k_restricted_reaches_higher(rng):
    docs = random_docs(rng, 2, lo=40, hi=80)
    _, index = build_index(docs)
    A = index.sigma + 1
    budget_k4q = 256 * index.n * 8  # 4**4 ACGT keys
    assert query_pos.choose_k(index, budget_k4q, alphabet=b"ACGT") == 4
    if A == 6:  # general keys: 6**4 = 1296 blocks is 5x over that budget
        assert query_pos.choose_k(index, budget_k4q) == 3
    # restricted k=2 fits where general k=2 does not (16 vs 36 blocks)
    assert query_pos.choose_k(index, 17 * index.n * 8, alphabet=b"ACGT") == 2


@pytest.mark.parametrize("M", [32, 252, 256])
def test_packed_out_equals_unpacked(rng, M):
    """packed_out returns pml<<8|cid in one plane (u16 when M <= 255),
    bit-identical to the two-plane output after host unpacking."""
    import jax.numpy as jnp

    base = bytes(rng.choice(list(b"ACGT"), 300).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    _, index = build_index(docs)
    pt = query_pos.build_pos_tables(index, k=2)
    reads = make_reads(rng, docs, 12, lo=20, hi=min(M, 200))
    dig, lens, _ = query_pos._encode_digits(index, pt, reads, M)
    assert dig.dtype == np.uint8
    ej, lj = jnp.asarray(dig), jnp.asarray(lens)
    p1, c1 = query_pos.query_batch_pos(pt["table"], pt["n"], ej, lj,
                                       k=2, A=pt["A"])
    pk, none = query_pos.query_batch_pos(pt["table"], pt["n"], ej, lj,
                                         k=2, A=pt["A"], packed_out=True)
    assert none is None
    assert np.asarray(pk).dtype == (np.uint16 if M <= 255 else np.int32)
    p2, c2 = query_pos.unpack_pml_cid(pk)
    np.testing.assert_array_equal(np.asarray(p1), p2)
    np.testing.assert_array_equal(np.asarray(c1), c2)


def test_pack_digits_roundtrip_and_query(rng):
    """2-bit digit packing is lossless through the device unpack, and the
    packed query path equals the unpacked one."""
    import jax.numpy as jnp

    from colbwt_tpu.models.index import ColPmlIndex
    from colbwt_tpu.ops import query_pos
    from tests.test_query_xla import build_index, make_reads

    base = bytes(rng.choice(list(b"ACGT"), 400).astype("uint8"))
    docs = random_docs(rng, 3, mutate_from=base)
    tbl, _ = build_index(docs)
    index = ColPmlIndex.from_table(tbl)
    pt = query_pos.build_pos_tables(index, 2, alphabet=b"ACGT")
    reads = make_reads(rng, docs, 8)
    M = 64  # multiple of k=2 and of the 4-digits/byte group
    dig, lens, bad = query_pos._encode_digits(index, pt, reads, M)
    assert not bad.any()
    packed, bits = query_pos.pack_digits(dig, pt["A"])
    assert bits == 2 and packed.shape == (dig.shape[0], M // 4)
    unp = np.asarray(query_pos._unpack_digits(jnp.asarray(packed), bits))
    np.testing.assert_array_equal(unp, dig)
    p0, c0 = query_pos.query_batch_pos(pt["table"], pt["n"],
                                       jnp.asarray(dig), jnp.asarray(lens),
                                       k=2, A=pt["A"])
    p1, c1 = query_pos.query_batch_pos(pt["table"], pt["n"],
                                       jnp.asarray(packed), jnp.asarray(lens),
                                       k=2, A=pt["A"], pack=bits)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
