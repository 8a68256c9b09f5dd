#!/usr/bin/env python3
"""Mint the checked-in toy-config goldens (tests/goldens/).

The reference README's toy config is a *shape* — 2 FASTAs, `-r -m tunnels
-s 10` (README.md:51-76) — with no shipped data, so the goldens pin OUR
deterministic toy instance: seq1/seq2 generated from a fixed seed, PML+CID
computed independently by the NumPy oracle AND the single-core C++ engine
(they must agree at mint time), stored as the reference text format.

Run from the repo root:  python scripts/mint_goldens.py
Regenerating is only legitimate when the toy FASTAs themselves change.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

GOLD = REPO / "tests" / "goldens"


def main() -> None:
    from colbwt_tpu.io import native
    from colbwt_tpu.io.fasta import FastaRecord, write_fasta
    from colbwt_tpu.io.pml_out import write_pml_cid_text
    from colbwt_tpu.ops import oracle as O
    from colbwt_tpu.pipeline import build_pipeline
    from colbwt_tpu.utils.config import ColBwtConfig
    from colbwt_tpu.io import formats as F

    GOLD.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0xC01B)  # fixed: goldens are pinned
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 800)
    for i in (1, 2):
        d = base.copy()
        muts = rng.integers(0, d.size, 6)
        d[muts] = rng.choice(np.frombuffer(b"ACGT", np.uint8), muts.size)
        write_fasta(GOLD / f"seq{i}.fa",
                    [FastaRecord(f"seq{i}", d.tobytes())])
    reads = []
    docs = [(GOLD / f"seq{i}.fa").read_bytes() for i in (1, 2)]
    seq1 = b"".join(line for line in docs[0].splitlines()[1:])
    for j in range(8):
        s = int(rng.integers(0, len(seq1) - 64))
        reads.append(FastaRecord(f"read{j}", seq1[s:s + 64]))
    write_fasta(GOLD / "pattern.fa", reads)

    # toy-config build: tunnels, -s 10, -r (README.md:51-62)
    cfg = ColBwtConfig(min_mum=20, split_rate=10, rev_comp=True, force=True,
                       keep_temp=True)
    build_pipeline([str(GOLD / "seq1.fa"), str(GOLD / "seq2.fa")],
                   str(GOLD / "toy"), cfg)
    heads, lens = F.read_rlbwt(GOLD / "toy.fa")
    thr = F.read_thresholds_file(GOLD / "toy.fa.thr_pos")
    bv = F.read_sdsl_bit_vector(GOLD / "toy.fa.col_runs")
    ids = F.read_col_ids(GOLD / "toy.fa.col_ids")
    tbl = O.build_col_pml(heads, lens, np.flatnonzero(bv),
                          ids.astype(np.int64), thr.astype(np.int64))

    seqs = [r.seq for r in reads]
    pml_o, cid_o = [], []
    for s in seqs:
        p, c = O.query_pml_oracle(tbl, s)
        pml_o.append(p)
        cid_o.append(c)
    assert native.available(), "mint requires the native C++ engine"
    pml_c, cid_c = native.query_pml_serial(tbl, seqs)
    for a, b in zip(pml_o, pml_c):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(cid_o, cid_c):
        np.testing.assert_array_equal(a, b)

    write_pml_cid_text(GOLD / "pattern.fa.pml.golden",
                       GOLD / "pattern.fa.cid.golden",
                       [r.name for r in reads], pml_o, cid_o)
    # drop build artifacts; only inputs + goldens are checked in
    for p in GOLD.glob("toy*"):
        p.unlink()
    print(f"goldens minted under {GOLD} (oracle == C++ on "
          f"{len(seqs)} reads)")


if __name__ == "__main__":
    main()
