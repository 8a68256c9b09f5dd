"""Round-trip and golden-byte tests for the on-disk codecs (SURVEY §2.4)."""

import numpy as np
import pytest

from colbwt_tpu.io import formats as F
from colbwt_tpu.io.fasta import FastaRecord, read_fasta, write_fasta, reverse_complement
from colbwt_tpu.io import pml_out


def test_fixed_int_roundtrip(tmp_path, rng):
    for width in (1, 2, 4, 5, 8):
        hi = min(2 ** (8 * width), 2 ** 63)
        vals = rng.integers(0, hi, 1000).astype(np.uint64)
        p = tmp_path / f"ints{width}"
        F.write_fixed_ints(p, vals, width)
        assert p.stat().st_size == 1000 * width
        got = F.read_fixed_ints(p, width)
        np.testing.assert_array_equal(got, vals)


def test_fixed_int_golden():
    # 5-byte little-endian: 0x0102030405 -> bytes 05 04 03 02 01
    enc = F.encode_fixed_ints(np.array([0x0102030405], dtype=np.uint64), 5)
    assert enc == bytes([0x05, 0x04, 0x03, 0x02, 0x01])
    assert F.decode_fixed_ints(enc, 5)[0] == 0x0102030405


def test_fixed_int_overflow():
    with pytest.raises(OverflowError):
        F.encode_fixed_ints(np.array([256], dtype=np.uint64), 1)


def test_rlbwt_roundtrip(tmp_path, rng):
    heads = rng.integers(1, 255, 64).astype(np.uint8)
    lens = rng.integers(1, 100000, 64).astype(np.uint64)
    F.write_rlbwt(tmp_path / "x", heads, lens)
    h2, l2 = F.read_rlbwt(tmp_path / "x")
    np.testing.assert_array_equal(h2, heads)
    np.testing.assert_array_equal(l2, lens)


def test_plain_bwt_expand(tmp_path):
    F.write_plain_bwt(tmp_path / "b.bwt", np.array([65, 66, 65], dtype=np.uint8),
                      np.array([3, 1, 2]))
    assert (tmp_path / "b.bwt").read_bytes() == b"AAABAA"


def test_col_mums_roundtrip(tmp_path):
    lens = np.array([21, 35, 40], dtype=np.uint64)
    pos = np.array([100, 5, 77], dtype=np.uint64)
    F.write_col_mums(tmp_path / "m.col_mums", 8, lens, pos)
    nd, l2, p2 = F.read_col_mums(tmp_path / "m.col_mums")
    assert nd == 8
    np.testing.assert_array_equal(l2, lens)
    np.testing.assert_array_equal(p2, pos)
    # file size: (1 + 2*3) values x 5 bytes (src/col_split.cpp:90-106 contract)
    assert (tmp_path / "m.col_mums").stat().st_size == 7 * 5


def test_col_ids_binning(tmp_path):
    ids = np.array([0, 1, 254, 255, 256, 509, 510], dtype=np.uint64)
    binned = F.write_col_ids(tmp_path / "i.col_ids", ids)
    # (id % 255) + 1 for id >= 256... reference: id >= id_max(=256) wraps
    # (include/common/common.hpp:306-308): 255 stays (255 < 256), 256 -> 2,
    # 509 -> 255, 510 -> 1
    np.testing.assert_array_equal(binned, [0, 1, 254, 255, 2, 255, 1])
    got = F.read_col_ids(tmp_path / "i.col_ids")
    np.testing.assert_array_equal(got, binned)


def test_sdsl_bit_vector_roundtrip(tmp_path, rng):
    for n in (1, 7, 64, 65, 1000):
        bits = rng.random(n) < 0.3
        F.write_sdsl_bit_vector(tmp_path / "bv", bits)
        got = F.read_sdsl_bit_vector(tmp_path / "bv")
        np.testing.assert_array_equal(got, bits)


def test_sdsl_bit_vector_golden(tmp_path):
    # 65 bits, bit 0 and bit 64 set: header=65, words = [1, 1]
    bits = np.zeros(65, dtype=bool)
    bits[0] = bits[64] = True
    F.write_sdsl_bit_vector(tmp_path / "bv", bits)
    raw = (tmp_path / "bv").read_bytes()
    assert raw == np.array([65, 1, 1], dtype="<u8").tobytes()


def test_fasta_roundtrip(tmp_path):
    recs = [FastaRecord("read1", b"ACGTACGTAA"), FastaRecord("read2", b"TTTT")]
    write_fasta(tmp_path / "x.fa", recs, width=4)
    got = list(read_fasta(tmp_path / "x.fa"))
    assert [(r.name, r.seq) for r in got] == [(r.name, r.seq) for r in recs]


def test_fasta_gz_and_fastq(tmp_path):
    import gzip
    (tmp_path / "r.fq.gz").write_bytes(gzip.compress(
        b"@q1 desc\nACGT\nAC\n+\nIIII\nII\n@q2\nGG\n+\nII\n"))
    got = list(read_fasta(tmp_path / "r.fq.gz"))
    assert [(r.name, r.seq) for r in got] == [("q1", b"ACGTAC"), ("q2", b"GG")]


def test_reverse_complement():
    assert reverse_complement(b"ACGTN") == b"NACGT"


def test_pml_text_format(tmp_path):
    # exact reference format: '>NAME \n' then 'v ' per value then '\n'
    # (src/pml_query.cpp:74-90)
    pml_out.write_pml_cid_text(tmp_path / "p.pml", tmp_path / "p.cid",
                               ["r1"], [np.array([0, 1, 2])], [np.array([5, 5, 0])])
    assert (tmp_path / "p.pml").read_text() == ">r1 \n0 1 2 \n"
    assert (tmp_path / "p.cid").read_text() == ">r1 \n5 5 0 \n"


def test_pml_binary_roundtrip(tmp_path, rng):
    names = ["a", "longer_read_name/1"]
    pmls = [rng.integers(0, 200, 150), rng.integers(0, 200, 80)]
    cids = [rng.integers(0, 255, 150), rng.integers(0, 255, 80)]
    pml_out.write_pml_cid_binary(tmp_path / "x.pml.bin", tmp_path / "x.cid.bin",
                                 names, pmls, cids)
    n2, p2 = pml_out.read_pml_cid_binary(tmp_path / "x.pml.bin")
    n3, c2 = pml_out.read_pml_cid_binary(tmp_path / "x.cid.bin")
    assert n2 == names and n3 == names
    for a, b in zip(p2, pmls):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(c2, cids):
        np.testing.assert_array_equal(a, b)


def test_col_pml_file_roundtrip_and_query(tmp_path, rng):
    """Packed col_thr row file (include/col_bwt.hpp:360-380 layout):
    write from a built table, read back, query — identical results."""
    from colbwt_tpu.ops import oracle as O
    from tests.conftest import random_docs
    from tests.test_query_xla import build_index

    base = bytes(rng.choice(list(b"ACGT"), 200).astype("uint8"))
    docs = random_docs(rng, 2, mutate_from=base)
    tbl, _ = build_index(docs)
    F.write_col_pml_file(tmp_path / "x.col_pml", bwt_r=int(tbl.bwt_r),
                         n=tbl.n, char=tbl.char, idx=tbl.idx,
                         dest_interval=tbl.dest_interval,
                         dest_offset=tbl.dest_offset,
                         col_id=tbl.col_id, threshold=tbl.threshold)
    # 32-byte header + 18 bytes per row (the reference's packed col_thr size)
    assert (tmp_path / "x.col_pml").stat().st_size == 32 + 18 * tbl.r
    d = F.read_col_pml_file(tmp_path / "x.col_pml")
    assert d["bwt_r"] == tbl.bwt_r and d["n"] == tbl.n and d["r"] == tbl.r
    loaded = O.LFTableArrays(
        char=d["char"], idx=d["idx"],
        length=np.diff(np.r_[d["idx"], d["n"]]),
        dest_interval=d["dest_interval"], dest_offset=d["dest_offset"],
        n=d["n"], r=d["r"], col_id=d["col_id"], threshold=d["threshold"],
        bwt_r=d["bwt_r"])
    pattern = docs[0][30:90]
    p1, c1 = O.query_pml_oracle(tbl, pattern)
    p2, c2 = O.query_pml_oracle(loaded, pattern)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(c1, c2)


# ---------------------------------------------------------------------------
# sd_vector (Elias-Fano) codec + .FL_table artifact
# ---------------------------------------------------------------------------

def test_sdsl_int_vector_roundtrip(rng):
    for width in (1, 3, 5, 8, 17, 40, 64):
        hi = (1 << width) - 1 if width < 64 else (1 << 63)
        vals = rng.integers(0, hi, 37, dtype=np.uint64) % np.uint64(max(hi, 1))
        buf = F.encode_sdsl_int_vector(vals, width)
        # header 9 bytes + whole LE words
        assert len(buf) == 9 + ((37 * width + 63) // 64) * 8
        out, w, off = F.decode_sdsl_int_vector(buf)
        assert w == width and off == len(buf)
        np.testing.assert_array_equal(out, vals)


def test_sd_vector_roundtrip(rng):
    for size, m in ((1, 0), (10, 1), (64, 64), (1000, 37), (1 << 20, 4096)):
        positions = np.sort(rng.choice(size, m, replace=False)).astype(np.uint64)
        core = F.encode_sd_vector(positions, size, with_select=False)
        pos, sz, off = F.decode_sd_vector(core)
        assert sz == size and off == len(core)
        np.testing.assert_array_equal(pos, positions.astype(np.int64))
        # the default (sdsl-loadable) frame appends exactly two select blocks
        full = F.encode_sd_vector(positions, size)
        assert full[:len(core)] == core
        pos, sz, off = F.decode_sd_vector(full)
        np.testing.assert_array_equal(pos, positions.astype(np.int64))
        off = F.skip_select_support_mcl(full, off)
        off = F.skip_select_support_mcl(full, off)
        assert off == len(full)


def test_sd_vector_wl_matches_sdsl_formula():
    """Lock the header: wl = (hi(n)+1) - (hi(m)+1 [-1 if equal]) — the
    sd_vector_builder parameter choice (see formats.py module comment)."""
    buf = F.encode_sd_vector(np.array([3, 17, 900], dtype=np.uint64), 1000)
    # n=1000: logn=10; m=3: logm=2; wl=8
    assert buf[8] == 8
    buf = F.encode_sd_vector(np.arange(900, dtype=np.uint64), 1000)
    # m=900: logm=10 == logn -> 9; wl=1
    assert buf[8] == 1


def test_sd_vector_reader_skips_trailing_select_blocks():
    positions = np.array([2, 5, 11], dtype=np.uint64)
    core = F.encode_sd_vector(positions, 32, with_select=False)
    # fabricate two empty select_support_mcl frames (arg_cnt = 0)
    raw = core + np.zeros(2, dtype="<u8").tobytes()
    pos, size, off = F.decode_sd_vector(raw)
    np.testing.assert_array_equal(pos, positions.astype(np.int64))
    off = F.skip_select_support_mcl(raw, off)
    off = F.skip_select_support_mcl(raw, off)
    assert off == len(raw)


def _check_select_frame(bits, pattern, rng):
    """Emit a select_support_mcl frame and prove every query answer (plus a
    random sample when there are many) equals the true position."""
    buf = F.encode_select_support_mcl(bits, pattern)
    st, off = F.decode_select_support_mcl(buf)
    assert off == len(buf)
    truth = np.flatnonzero(bits if pattern else ~np.asarray(bits, bool))
    assert st["arg_cnt"] == truth.size
    if truth.size == 0:
        return
    qs = range(1, truth.size + 1) if truth.size <= 512 else np.unique(
        np.r_[1, truth.size, rng.integers(1, truth.size + 1, 256)])
    for i in qs:
        assert F.select_support_mcl_query(st, bits, int(i), pattern) == truth[i - 1]


def test_select_support_mcl_mini_blocks(rng):
    """Dense vectors stay under the logn**4 span threshold: mini blocks,
    empty mini_or_long indicator (select_support_mcl.hpp serialize)."""
    for size in (1, 63, 64, 65, 4096, 9000):
        bits = rng.random(size) < 0.5
        for pattern in (1, 0):
            _check_select_frame(bits, pattern, rng)
    # all-zeros / all-ones edges
    _check_select_frame(np.zeros(100, bool), 1, rng)
    _check_select_frame(np.ones(100, bool), 1, rng)


def test_select_support_mcl_long_blocks(rng):
    """A superblock spanning > logn**4 positions must serialize as a long
    block holding absolute positions (partial last superblock included)."""
    size = 1 << 21  # logn = 21+ -> logn**4 ~ 2e5 << spans below
    bits = np.zeros(size, bool)
    ones = np.sort(rng.choice(size, 5000, replace=False))  # avg gap ~420
    bits[ones] = True
    buf = F.encode_select_support_mcl(bits, 1)
    st, off = F.decode_select_support_mcl(buf)
    assert off == len(buf)
    assert st["is_long"].size and st["is_long"].all()  # sparse -> long blocks
    _check_select_frame(bits, 1, rng)
    _check_select_frame(bits, 0, rng)  # zeros are dense -> mini blocks


def test_select_support_mcl_superblock_boundaries(rng):
    """arg_cnt an exact multiple of 4096 and one past it."""
    for m in (4096, 4097, 8192):
        size = 3 * m
        bits = np.zeros(size, bool)
        bits[np.sort(rng.choice(size, m, replace=False))] = True
        _check_select_frame(bits, 1, rng)


def test_fl_table_file_roundtrip(tmp_path, rng):
    """.FL_table artifact (FL_table::serialize, include/ds/FL_table.hpp:
    303-333): n + r + EF L_heads + 12-byte packed rows; the loaded table
    forward-steps identically."""
    from colbwt_tpu.ops import oracle as O
    from tests.conftest import random_docs

    docs = random_docs(rng, 3, lo=60, hi=140)
    text, ranks, _ = O.concat_collection(docs)
    sa = O.suffix_array(ranks)
    heads, lens = O.rle(O.bwt_from_sa(text, sa))
    fl = O.build_fl_table(heads, lens)
    path = tmp_path / "x.FL_table"
    F.write_fl_table_file(path, n=fl.n, char=fl.char, idx=fl.idx,
                          dest_interval=fl.dest_interval,
                          dest_offset=fl.dest_offset, l_heads=fl.l_heads)
    d = F.read_fl_table_file(path)
    assert d["n"] == fl.n and d["r"] == fl.r
    np.testing.assert_array_equal(d["l_heads"], fl.l_heads)
    loaded = O.FLTableArrays(
        char=d["char"], idx=d["idx"],
        length=np.diff(np.r_[d["idx"], d["n"]]),
        dest_interval=d["dest_interval"], dest_offset=d["dest_offset"],
        l_heads=d["l_heads"], n=d["n"], r=d["r"])
    assert O.decompress(loaded) == O.decompress(fl)


def test_col_runs_sparse_file(tmp_path):
    """.col_runs.sv sparse variant (include/col_split.hpp:377-382)."""
    bits = np.array([0, 7, 8, 63, 64, 100], dtype=np.uint64)
    F.write_sdsl_sd_vector(tmp_path / "x.col_runs.sv", bits, 128)
    pos, size = F.read_sdsl_sd_vector(tmp_path / "x.col_runs.sv")
    assert size == 128
    np.testing.assert_array_equal(pos, bits.astype(np.int64))
