"""FASTA / FASTQ (.gz) streaming reader.

Behavioral equivalent of the reference's PatternProcessor (include/common/
io.hpp:6-35, klib kseq underneath): yields (id, sequence) records, transparently
gunzipping.  A buffered pure-Python parser; the native C++ reader in
colbwt_tpu.io.native takes over for large inputs when built.
"""

from __future__ import annotations

import dataclasses
import gzip
import io
from pathlib import Path
from typing import Iterator


@dataclasses.dataclass
class FastaRecord:
    name: str
    seq: bytes


def _open(path: str | Path) -> io.BufferedReader:
    p = Path(path)
    raw = p.open("rb")
    head = raw.peek(2)[:2] if hasattr(raw, "peek") else b""
    if head == b"\x1f\x8b" or p.suffix == ".gz":
        return io.BufferedReader(gzip.open(raw))  # type: ignore[arg-type]
    return raw


def read_fasta(path: str | Path) -> Iterator[FastaRecord]:
    """Stream records from a FASTA or FASTQ file (optionally gzipped).

    Like kseq, the record name is the first whitespace-delimited token after
    '>' / '@'; multi-line sequences are concatenated.  Large plain FASTA
    files route through the native C++ parser when built.
    """
    p = Path(path)
    if (p.suffix not in (".gz", ".fastq", ".fq")
            and p.exists() and p.stat().st_size > (1 << 20)):
        try:
            from colbwt_tpu.io import native

            if native.available():
                head = p.open("rb").read(2)
                if head[:1] == b">":
                    for name, seq in native.parse_fasta_bytes(p.read_bytes()):
                        yield FastaRecord(name, seq)
                    return
        except Exception:
            pass  # fall through to the Python reader
    with _open(path) as fh:
        name: str | None = None
        chunks: list[bytes] = []
        fastq = False
        line_iter = iter(fh)
        for line in line_iter:
            line = line.rstrip()
            if not line:
                continue
            if line.startswith(b">") or line.startswith(b"@"):
                if name is not None:
                    yield FastaRecord(name, b"".join(chunks))
                fastq = line.startswith(b"@")
                name = line[1:].split()[0].decode() if len(line) > 1 else ""
                chunks = []
            elif line.startswith(b"+") and fastq:
                # quality header: skip quality lines until next record length
                seq_len = sum(len(c) for c in chunks)
                qual_len = 0
                for qline in line_iter:
                    qual_len += len(qline.rstrip())
                    if qual_len >= seq_len:
                        break
                yield FastaRecord(name or "", b"".join(chunks))
                name = None
                chunks = []
            else:
                chunks.append(line)
        if name is not None:
            yield FastaRecord(name, b"".join(chunks))


def stream_fasta(path: str | Path, chunk_bytes: int = 32 << 20
                 ) -> Iterator[FastaRecord]:
    """Bounded-memory FASTA streaming: parse the file in ~chunk_bytes slabs
    (native C++ parser per slab when built), never holding more than one slab
    of input.  Functionally identical to read_fasta; this is the reader for
    100M-read query streams, where read_fasta's native path would load the
    whole pattern file (SURVEY §2.2: klib/kseq streams — so do we)."""
    p = Path(path)
    use_native = False
    if p.suffix not in (".gz", ".fastq", ".fq") and p.exists():
        try:
            from colbwt_tpu.io import native

            use_native = (native.available()
                          and p.open("rb").read(1) == b">")
        except Exception:
            use_native = False
    if not use_native:
        yield from read_fasta(path)
        return
    from colbwt_tpu.io import native

    with p.open("rb") as fh:
        carry = b""
        while True:
            slab = fh.read(chunk_bytes)
            data = carry + slab
            if not data:
                return
            if slab:
                # hold back the trailing partial record ('>' starts one only
                # at the beginning of a line)
                cut = data.rfind(b"\n>")
                if cut < 0:
                    carry = data
                    continue
                carry = data[cut + 1:]
                data = data[:cut + 1]
            else:
                carry = b""
            for name, seq in native.parse_fasta_bytes(data):
                yield FastaRecord(name, seq)
            if not slab:
                return


def write_fasta(path: str | Path, records: list[FastaRecord], width: int = 60) -> None:
    with Path(path).open("wb") as fh:
        for rec in records:
            fh.write(b">" + rec.name.encode() + b"\n")
            for i in range(0, len(rec.seq), width):
                fh.write(rec.seq[i:i + width] + b"\n")


_COMP = bytes.maketrans(b"ACGTacgtNn", b"TGCAtgcaNn")


def reverse_complement(seq: bytes) -> bytes:
    """Reverse complement, used by the -r / --rev_comp build flag
    (scripts/col-bwt.py:138-139, 212)."""
    return seq.translate(_COMP)[::-1]
