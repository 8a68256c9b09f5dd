"""Native gzipped-FASTQ/FASTA slab streaming (io.fasta.stream_fasta).

The reference reads patterns through kseq+zlib (include/common/io.hpp:1-35,
thirdparty/CMakeLists.txt:21-32); our equivalent inflates gzip members
through zlib's C path and parses slabs with the native C++ scanner, using
a consumed-bytes contract for FASTQ carry ('@' is a legal quality char).
These tests compare every (format x compression x slab size) combination
against the pure-Python line parser on adversarial inputs.
"""

from __future__ import annotations

import gzip
import io

import numpy as np
import pytest

from colbwt_tpu.io import native
from colbwt_tpu.io.fasta import _parse_lines, read_fasta, stream_fasta

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _mk_fastq(rng, n_recs, adversarial=True) -> bytes:
    """FASTQ with multi-line sequences, '@'/'+' leading quality lines,
    occasional \r\n endings, and varied name/sequence lengths."""
    out = []
    for i in range(n_recs):
        m = int(rng.integers(1, 220))
        seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), m).tobytes()
        name = f"read_{i}" + ("x" * int(rng.integers(0, 9)))
        desc = " extra descr" if rng.random() < 0.3 else ""
        eol = b"\r\n" if adversarial and rng.random() < 0.2 else b"\n"
        out.append(b"@" + name.encode() + desc.encode() + eol)
        # sequence over 1-3 lines
        cuts = sorted(rng.integers(0, m + 1, int(rng.integers(0, 3))).tolist())
        prev = 0
        for c in cuts + [m]:
            out.append(seq[prev:c] + eol)
            prev = c
        out.append(b"+" + (name.encode() if rng.random() < 0.5 else b"") + eol)
        # quality: force '@' and '+' as leading chars sometimes
        qual = bytearray(rng.integers(33, 74, m).astype(np.uint8).tobytes())
        if adversarial and m > 0:
            qual[0] = ord("@") if rng.random() < 0.5 else ord("+")
        prev = 0
        for c in cuts + [m]:
            out.append(bytes(qual[prev:c]) + eol)
            prev = c
    return b"".join(out)


def _mk_fasta(rng, n_recs) -> bytes:
    out = []
    for i in range(n_recs):
        m = int(rng.integers(1, 300))
        seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), m).tobytes()
        out.append(f">rec{i} desc\n".encode())
        for j in range(0, m, 61):
            out.append(seq[j:j + 61] + b"\n")
    return b"".join(out)


def _expected(raw: bytes):
    return [(r.name, r.seq) for r in _parse_lines(io.BytesIO(raw))]


@pytest.mark.parametrize("gz", [False, True])
@pytest.mark.parametrize("chunk", [97, 4096, 1 << 20])
def test_stream_fastq_matches_python(tmp_path, gz, chunk):
    rng = np.random.default_rng(42)
    raw = _mk_fastq(rng, 400)
    f = tmp_path / ("r.fastq.gz" if gz else "r.fastq")
    f.write_bytes(gzip.compress(raw) if gz else raw)
    got = [(r.name, r.seq) for r in stream_fasta(f, chunk_bytes=chunk)]
    want = _expected(raw)
    assert len(got) == len(want) == 400
    assert got == want


@pytest.mark.parametrize("chunk", [113, 1 << 18])
def test_stream_fasta_gz_matches_python(tmp_path, chunk):
    rng = np.random.default_rng(7)
    raw = _mk_fasta(rng, 300)
    f = tmp_path / "r.fa.gz"
    f.write_bytes(gzip.compress(raw))
    got = [(r.name, r.seq) for r in stream_fasta(f, chunk_bytes=chunk)]
    assert got == _expected(raw)


def test_stream_multimember_gzip(tmp_path):
    """bgzip-style concatenated gzip members inflate transparently."""
    rng = np.random.default_rng(3)
    raw = _mk_fastq(rng, 120)
    third = len(raw) // 3
    f = tmp_path / "r.fq.gz"
    f.write_bytes(gzip.compress(raw[:third]) + gzip.compress(raw[third:2 * third])
                  + gzip.compress(raw[2 * third:]))
    got = [(r.name, r.seq) for r in stream_fasta(f, chunk_bytes=4096)]
    assert got == _expected(raw)


def test_stream_fastq_no_trailing_newline(tmp_path):
    rng = np.random.default_rng(9)
    raw = _mk_fastq(rng, 20).rstrip(b"\n")
    f = tmp_path / "r.fq"
    f.write_bytes(raw)
    got = [(r.name, r.seq) for r in stream_fasta(f, chunk_bytes=64)]
    assert got == _expected(raw)
    assert len(got) == 20


def test_parse_fastq_bytes_consumed_contract():
    """consumed always lands on a record boundary: re-parsing the tail of
    any split yields exactly the remaining records."""
    rng = np.random.default_rng(11)
    raw = _mk_fastq(rng, 60)
    want = _expected(raw)
    for cut in rng.integers(1, len(raw), 25).tolist():
        head, consumed = native.parse_fastq_bytes(raw[:cut])
        tail, consumed2 = native.parse_fastq_bytes(raw[consumed:])
        # everything past the second parse is record-less whitespace
        assert raw[consumed + consumed2:].strip(b"\r\n") == b""
        assert [(n, s) for n, s in head + tail] == want, f"cut {cut}"


def test_stream_matches_read_fasta_on_plain(tmp_path):
    rng = np.random.default_rng(5)
    raw = _mk_fasta(rng, 150)
    f = tmp_path / "r.fa"
    f.write_bytes(raw)
    a = [(r.name, r.seq) for r in stream_fasta(f, chunk_bytes=701)]
    b = [(r.name, r.seq) for r in read_fasta(f)]
    assert a == b
