"""Persisted device-layout table cache (pipeline/tables.py): a second
launch reloads pos/mega/mega-wide tables instead of rebuilding, outputs
stay byte-identical, and a stale cache (rebuilt index) is rejected."""

import numpy as np
import pytest

from colbwt_tpu.models.index import ColPmlIndex
from colbwt_tpu.pipeline import tables as TB
from colbwt_tpu.pipeline.engines import QueryEngines
from colbwt_tpu.utils.config import ColBwtConfig
from tests.conftest import random_docs
from tests.test_query_xla import build_index, make_reads


def _query(eng: QueryEngines, reads):
    p, c, lens = QueryEngines.materialize(eng.dispatch(reads, 64))
    W = p.shape[1]
    return ([p[i, W - int(lens[i]):] for i in range(len(reads))],
            [c[i, W - int(lens[i]):] for i in range(len(reads))])


@pytest.mark.parametrize("engine,wide", [("pos", False), ("mega", False),
                                         ("auto", True)])
def test_roundtrip_and_reload(tmp_path, rng, engine, wide):
    docs = random_docs(rng, 3, lo=120, hi=200)
    tbl, index = build_index(docs)
    if engine == "mega" or wide:
        index = ColPmlIndex.build(tbl, ff_bound=2,
                                  wide=True if wide else None)
    reads = make_reads(rng, docs, 8, lo=20, hi=50)
    cfg = ColBwtConfig(engine=engine, batch_size=8, table_cache="force")

    eng1 = QueryEngines(index, cfg, total_chars=10**9,
                        table_dir=str(tmp_path / "t"))
    assert eng1.cache_events and eng1.cache_events[0]["event"] == "build+save"
    p1, c1 = _query(eng1, reads)

    eng2 = QueryEngines(index, cfg, total_chars=10**9,
                        table_dir=str(tmp_path / "t"))
    assert eng2.cache_events and eng2.cache_events[0]["event"] == "load"
    p2, c2 = _query(eng2, reads)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(c1, c2):
        np.testing.assert_array_equal(a, b)


def test_stale_cache_rejected(tmp_path, rng):
    docs = random_docs(rng, 2, lo=100, hi=160)
    _, index = build_index(docs)
    cfg = ColBwtConfig(engine="pos", batch_size=4, table_cache="force")
    eng = QueryEngines(index, cfg, total_chars=10**9,
                       table_dir=str(tmp_path / "t"))
    assert eng.cache_events[0]["event"] == "build+save"

    # a different collection -> different fingerprint -> rebuild, not load
    docs2 = random_docs(rng, 2, lo=100, hi=160)
    _, index2 = build_index(docs2)
    eng2 = QueryEngines(index2, cfg, total_chars=10**9,
                        table_dir=str(tmp_path / "t"))
    assert eng2.cache_events[0]["event"] == "build+save"

    # format bump also invalidates
    old = TB.TABLES_FORMAT
    try:
        TB.TABLES_FORMAT = old + 1
        assert TB.load_tables(str(tmp_path / "t"), "pos", index2) is None
    finally:
        TB.TABLES_FORMAT = old


def test_table_cache_off(tmp_path, rng):
    docs = random_docs(rng, 2, lo=100, hi=160)
    _, index = build_index(docs)
    cfg = ColBwtConfig(engine="pos", batch_size=4, table_cache="off")
    eng = QueryEngines(index, cfg, total_chars=10**9,
                       table_dir=str(tmp_path / "t"))
    assert not eng.cache_events
    assert not (tmp_path / "t").exists()
