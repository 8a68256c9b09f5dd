"""End-to-end pipeline + CLI tests on the README toy configuration
(2 FASTAs, tunnels, sub-sample 10 — SURVEY §7 minimum slice)."""

import numpy as np
import pytest

from colbwt_tpu.cli import main as cli_main
from colbwt_tpu.io import formats as F
from colbwt_tpu.io.fasta import FastaRecord, write_fasta
from colbwt_tpu.io.pml_out import read_pml_cid_binary
from colbwt_tpu.ops import oracle as O
from tests.conftest import random_docs


@pytest.fixture
def toy(tmp_path, rng):
    base = bytes(rng.choice(list(b"ACGT"), 400).astype("uint8"))
    d1, d2 = random_docs(rng, 2, mutate_from=base)
    write_fasta(tmp_path / "seq1.fa", [FastaRecord("seq1", d1)])
    write_fasta(tmp_path / "seq2.fa", [FastaRecord("seq2", d2)])
    reads = []
    for i in range(12):
        s = int(rng.integers(0, len(d1) - 60))
        reads.append(FastaRecord(f"read{i}", d1[s:s + 60]))
    write_fasta(tmp_path / "pattern.fa", reads)
    return tmp_path, [d1, d2], reads


def test_cli_build_and_query(toy):
    tmp, docs, reads = toy
    out = str(tmp / "index")
    rc = cli_main(["build", "-o", out, "-m", "tunnels", "-s", "10",
                   "-l", "15", str(tmp / "seq1.fa"), str(tmp / "seq2.fa")])
    assert rc == 0
    # mumemto-contract artifacts exist
    for ext in ("bwt.heads", "bwt.len", "thr_pos", "col_mums",
                "col_runs", "col_ids"):
        assert (tmp / f"index.fa.{ext}").exists(), ext
    assert (tmp / "index.colpml.npz").exists()

    rc = cli_main(["query", out, "-p", str(tmp / "pattern.fa"), "--text"])
    assert rc == 0
    names, pmls = read_pml_cid_binary(tmp / "pattern.fa.split.pml.bin")
    names2, cids = read_pml_cid_binary(tmp / "pattern.fa.split.cid.bin")
    assert names == [r.name for r in reads]
    assert all(p.size == 60 for p in pmls)

    # results equal the oracle run on the artifacts
    heads, lens = F.read_rlbwt(tmp / "index.fa")
    thr = F.read_thresholds_file(tmp / "index.fa.thr_pos")
    bv = F.read_sdsl_bit_vector(tmp / "index.fa.col_runs")
    ids = F.read_col_ids(tmp / "index.fa.col_ids")
    tbl = O.build_col_pml(heads, lens, np.flatnonzero(bv),
                          ids.astype(np.int64), thr.astype(np.int64))
    for rec, pml, cid in zip(reads, pmls, cids):
        ep, ec = O.query_pml_oracle(tbl, rec.seq)
        np.testing.assert_array_equal(pml, ep)
        np.testing.assert_array_equal(cid, ec)

    # text output format (src/pml_query.cpp:74-90)
    text = (tmp / "pattern.fa.pml").read_text()
    assert text.startswith(">read0 \n")
    first_line_vals = text.splitlines()[1]
    assert first_line_vals.endswith(" ")


def test_build_resumability(toy):
    tmp, docs, reads = toy
    out = str(tmp / "idx2")
    cli_main(["build", "-o", out, "-l", "15",
              str(tmp / "seq1.fa"), str(tmp / "seq2.fa")])
    mtime = (tmp / "idx2.colpml.npz").stat().st_mtime_ns
    # second build skips all stages (same artifacts untouched)
    cli_main(["build", "-o", out, "-l", "15",
              str(tmp / "seq1.fa"), str(tmp / "seq2.fa")])
    assert (tmp / "idx2.colpml.npz").stat().st_mtime_ns == mtime


def test_build_filelist_and_clean(toy):
    tmp, docs, reads = toy
    (tmp / "list.txt").write_text(
        f"{tmp / 'seq1.fa'} 1\n{tmp / 'seq2.fa'} 2\n")
    out = str(tmp / "idx3")
    rc = cli_main(["build", "-o", out, "-i", str(tmp / "list.txt"),
                   "-l", "15", "--clean"])
    assert rc == 0
    assert (tmp / "idx3.colpml.npz").exists()
    assert not (tmp / "idx3.fa.bwt.heads").exists()  # cleaned


def test_query_long_reads_through_cli(toy, rng):
    tmp, docs, reads = toy
    out = str(tmp / "idx_long")
    cli_main(["build", "-o", out, "-l", "15",
              str(tmp / "seq1.fa"), str(tmp / "seq2.fa")])
    # one long read (> long_read_len would need >1024; force via config is
    # internal — here just verify a 380bp read works within the same file
    # alongside short ones through the public CLI)
    long_reads = [FastaRecord("long0", docs[0][:380]),
                  FastaRecord("short0", docs[1][10:40])]
    write_fasta(tmp / "mixed.fa", long_reads)
    rc = cli_main(["query", out, "-p", str(tmp / "mixed.fa")])
    assert rc == 0
    names, pmls = read_pml_cid_binary(tmp / "mixed.fa.split.pml.bin")
    assert names == ["long0", "short0"]
    assert pmls[0].size == 380 and pmls[1].size == 30

    heads, lens = F.read_rlbwt(tmp / "idx_long.fa")
    thr = F.read_thresholds_file(tmp / "idx_long.fa.thr_pos")
    bv = F.read_sdsl_bit_vector(tmp / "idx_long.fa.col_runs")
    ids = F.read_col_ids(tmp / "idx_long.fa.col_ids")
    tbl = O.build_col_pml(heads, lens, np.flatnonzero(bv),
                          ids.astype(np.int64), thr.astype(np.int64))
    ep, _ = O.query_pml_oracle(tbl, docs[0][:380])
    np.testing.assert_array_equal(pmls[0], ep)


def test_query_rejects_missing_index(tmp_path):
    with pytest.raises(FileNotFoundError):
        cli_main(["query", str(tmp_path / "nope"), "-p", str(tmp_path / "x.fa")])


def test_query_pipeline_forced_pos_with_fallback_reads(toy):
    """engine="pos" on a DNA collection uses ACGT-restricted keys; reads
    containing N bytes splice back in via the general k=1 fallback."""
    from colbwt_tpu.pipeline import build_pipeline, query_pipeline
    from colbwt_tpu.utils.config import ColBwtConfig

    tmp, docs, reads = toy
    mixed = [r.seq for r in reads[:4]]
    mixed.append(docs[0][10:40] + b"N" + docs[0][41:80])
    write_fasta(tmp / "mix.fa",
                [FastaRecord(f"m{i}", s) for i, s in enumerate(mixed)])
    cfg = ColBwtConfig(min_mum=10, split_rate=2, engine="pos")
    build_pipeline([str(tmp / "seq1.fa"), str(tmp / "seq2.fa")],
                   str(tmp / "pidx"), cfg)
    _, pmls, cids = query_pipeline(str(tmp / "pidx"), str(tmp / "mix.fa"), cfg)

    heads, lens = F.read_rlbwt(tmp / "pidx.fa")
    thr = F.read_thresholds_file(tmp / "pidx.fa.thr_pos")
    bv = F.read_sdsl_bit_vector(tmp / "pidx.fa.col_runs")
    ids = F.read_col_ids(tmp / "pidx.fa.col_ids")
    tbl = O.build_col_pml(heads, lens, np.flatnonzero(bv),
                          ids.astype(np.int64), thr.astype(np.int64))
    for s, pml, cid in zip(mixed, pmls, cids):
        ep, ec = O.query_pml_oracle(tbl, s)
        np.testing.assert_array_equal(pml, ep, err_msg=repr(s))
        np.testing.assert_array_equal(cid, ec, err_msg=repr(s))


def test_long_text_output_format(toy):
    """The -l streaming text mode (pml_direct_to_file, src/pml_query.cpp:32-63):
    header and digits are written reversed, values in backward scan order,
    then every line is flipped by `rev` — so the final line carries values in
    forward order with the `>name ` header at the END of the line."""
    from colbwt_tpu.io.pml_out import write_pml_cid_text_long

    tmp, docs, reads = toy
    pml = [np.array([3, 12, 7]), np.array([0, 145])]
    cid = [np.array([0, 2, 2]), np.array([1, 0])]
    write_pml_cid_text_long(tmp / "x.pml", tmp / "x.cid",
                            ["read1", "r2"], pml, cid)
    assert (tmp / "x.pml").read_text() == \
        "\n3 12 7 >read1 \n\n0 145 >r2 \n"
    assert (tmp / "x.cid").read_text() == \
        "\n0 2 2 >read1 \n\n1 0 >r2 \n"


def test_query_long_flag_through_cli(toy):
    tmp, docs, reads = toy
    out = str(tmp / "idxl")
    cli_main(["build", "-o", out, "-l", "15",
              str(tmp / "seq1.fa"), str(tmp / "seq2.fa")])
    rc = cli_main(["query", out, "-p", str(tmp / "pattern.fa"),
                   "--text", "--long"])
    assert rc == 0
    # values parsed from the -l format equal the binary outputs
    names, pmls = read_pml_cid_binary(tmp / "pattern.fa.split.pml.bin")
    text = (tmp / "pattern.fa.pml").read_text()
    lines = text.split("\n")
    # layout: ["", "<vals> >name ", "", "<vals> >name ", ..., ""]
    for k, (name, pml) in enumerate(zip(names, pmls)):
        line = lines[1 + 2 * k]
        assert line.endswith(f">{name} ")
        vals = [int(v) for v in line[: line.index(">")].split()]
        np.testing.assert_array_equal(np.asarray(vals), pml)


def test_wide_pipeline_end_to_end(toy):
    """Lowering cfg.wide_n_limit forces the full wide path — int64 fields,
    run-length capping, ff>=2 run splitting, and query routing through
    ops.query_mega_wide (the n >= 2**31 lane, include/ds/LF_table.hpp:36-39)
    — on a toy build, end to end.  Limb arithmetic is exact at any n, so the
    outputs must equal the oracle bit for bit."""
    from colbwt_tpu.models.index import ColPmlIndex
    from colbwt_tpu.pipeline import build_pipeline, query_pipeline
    from colbwt_tpu.utils.config import ColBwtConfig

    tmp, docs, reads = toy
    cfg = ColBwtConfig(min_mum=15, wide_n_limit=100)
    build_pipeline([str(tmp / "seq1.fa"), str(tmp / "seq2.fa")],
                   str(tmp / "widx"), cfg)
    index = ColPmlIndex.load(str(tmp / "widx.colpml.npz"))
    assert index.wide and index.wide_override is True
    assert index.idx.dtype == np.int64 and index.ff_bound >= 2
    # mixed short reads + one long read (exercises the wide long-read path)
    mixed = [r.seq for r in reads[:6]] + [docs[0][:380]]
    write_fasta(tmp / "wmix.fa",
                [FastaRecord(f"w{i}", s) for i, s in enumerate(mixed)])
    qcfg = ColBwtConfig(wide_n_limit=100, long_read_len=128)
    _, pmls, cids = query_pipeline(str(tmp / "widx"), str(tmp / "wmix.fa"),
                                   qcfg)

    heads, lens = F.read_rlbwt(tmp / "widx.fa")
    thr = F.read_thresholds_file(tmp / "widx.fa.thr_pos")
    bv = F.read_sdsl_bit_vector(tmp / "widx.fa.col_runs")
    ids = F.read_col_ids(tmp / "widx.fa.col_ids")
    tbl = O.build_col_pml(heads, lens, np.flatnonzero(bv),
                          ids.astype(np.int64), thr.astype(np.int64))
    for s, pml, cid in zip(mixed, pmls, cids):
        ep, ec = O.query_pml_oracle(tbl, s)
        np.testing.assert_array_equal(pml, ep, err_msg=repr(s))
        np.testing.assert_array_equal(cid, ec, err_msg=repr(s))


def test_plain_bwt_constructor_path(toy):
    """build_col_pml_from_plain_bwt (the include/col_bwt.hpp:232-329 surface)
    equals the RLBWT construction path on real artifacts."""
    tmp, docs, reads = toy
    out = str(tmp / "idxp")
    cli_main(["build", "-o", out, "-l", "15", "--keep",
              str(tmp / "seq1.fa"), str(tmp / "seq2.fa")])
    heads, lens = F.read_rlbwt(tmp / "idxp.fa")
    thr = F.read_thresholds_file(tmp / "idxp.fa.thr_pos")
    bv = F.read_sdsl_bit_vector(tmp / "idxp.fa.col_runs")
    ids = F.read_col_ids(tmp / "idxp.fa.col_ids")
    bits = np.flatnonzero(bv)
    ref = O.build_col_pml(heads, lens, bits, ids.astype(np.int64),
                          thr.astype(np.int64))
    bwt = (tmp / "idxp.fa.bwt").read_bytes()
    alt = O.build_col_pml_from_plain_bwt(bwt, bits, ids.astype(np.int64),
                                         thr.astype(np.int64))
    assert alt.r == ref.r and alt.n == ref.n and alt.bwt_r == ref.bwt_r
    for f in ("char", "idx", "length", "dest_interval", "dest_offset",
              "col_id", "threshold"):
        np.testing.assert_array_equal(getattr(alt, f), getattr(ref, f))


def test_cli_chunked_sa_mode_matches_monolithic(toy):
    """--sa-mode chunked through the CLI produces identical artifacts to
    the monolithic lane (and the intra-stage cache dir is cleaned up)."""
    tmp, docs, reads = toy
    a, b = str(tmp / "mono"), str(tmp / "chnk")
    args = ["-l", "15", str(tmp / "seq1.fa"), str(tmp / "seq2.fa")]
    assert cli_main(["build", "-o", a] + args) == 0
    assert cli_main(["build", "-o", b, "--sa-mode", "chunked",
                     "--chunk-chars", "300"] + args) == 0
    for ext in ("bwt.heads", "bwt.len", "thr_pos", "col_mums",
                "col_runs", "col_ids"):
        assert (tmp / f"mono.fa.{ext}").read_bytes() == \
            (tmp / f"chnk.fa.{ext}").read_bytes(), ext
    assert not (tmp / "chnk.chunked_cache").exists()


def test_cli_chunked_survives_corrupt_stage_cache(toy):
    """A truncated stage-cache file (kill during write, disk hiccup) must
    trigger a rebuild, not a crash, and still produce correct artifacts."""
    from pathlib import Path

    from colbwt_tpu.ops import construct_chunked as CC
    import numpy as np

    tmp, docs, reads = toy
    a, b = str(tmp / "ok"), str(tmp / "hurt")
    args = ["-l", "15", str(tmp / "seq1.fa"), str(tmp / "seq2.fa")]
    assert cli_main(["build", "-o", a, "--sa-mode", "chunked",
                     "--chunk-chars", "300"] + args) == 0
    # plant a corrupt cache at the fingerprint the build will compute
    from colbwt_tpu.pipeline.build import load_documents

    dd = load_documents([str(tmp / "seq1.fa"), str(tmp / "seq2.fa")],
                        None, False)
    n_total = sum(len(d) + 1 for d in dd)
    text = np.empty(n_total, dtype=np.uint8)
    starts = np.zeros(len(dd) + 1, dtype=np.int64)
    pos = 0
    for i, d in enumerate(dd):
        arr = np.frombuffer(d, dtype=np.uint8)
        text[pos:pos + arr.size] = arr
        text[pos + arr.size] = CC.TERMINATOR
        pos += arr.size + 1
        starts[i + 1] = pos
    fp = CC._input_fingerprint(text, starts, True)
    ck = Path(f"{b}.chunked_cache")
    ck.mkdir(parents=True, exist_ok=True)
    (ck / f"rlbwt.{fp}.npz").write_bytes(b"PK\x03\x04 truncated junk")
    assert cli_main(["build", "-o", b, "--sa-mode", "chunked",
                     "--chunk-chars", "300"] + args) == 0
    for ext in ("bwt.heads", "bwt.len", "thr_pos", "col_mums"):
        assert (tmp / f"ok.fa.{ext}").read_bytes() == \
            (tmp / f"hurt.fa.{ext}").read_bytes(), ext
