#!/usr/bin/env python3
"""Measure (a) the log-composition pos k=4 table build vs the round-2
direct-composition baseline (62.8 s, BENCH_r02.json) and (b) persisted
table-cache save/load through this machine's host<->device path, on the
bench index.  Records the honest build-vs-load comparison BASELINE.md
cites for cfg.table_cache."""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def log(m):
    print(f"[tcache] {m}", file=sys.stderr, flush=True)


def main():
    from colbwt_tpu.utils.log import enable_compilation_cache

    enable_compilation_cache(str(REPO / ".bench_cache" / "jax_cache"))
    import bench

    index, tbl = bench.get_index_and_table()
    log(f"index n={index.n} r={index.r}")

    from colbwt_tpu.ops import query_pos
    from colbwt_tpu.pipeline import tables as TB

    t0 = time.perf_counter()
    pt = query_pos.build_pos_tables(index, 4, alphabet=b"ACGT")
    _ = int(np.asarray(pt["table"][:2, 0]).sum())  # materialize
    build_s = time.perf_counter() - t0
    gb = pt["table"].nbytes / 1e9
    log(f"k=4 ACGT build (log-composition): {build_s:.1f}s ({gb:.1f} GB) "
        f"[round-2 direct composition: 62.8s]")

    d = REPO / ".bench_cache" / "tables_probe"
    t0 = time.perf_counter()
    TB.save_tables(d, "pos", index, pt, build_seconds=build_s)
    save_s = time.perf_counter() - t0
    log(f"save to disk (device->host->npy): {save_s:.1f}s")

    del pt
    t0 = time.perf_counter()
    got = TB.load_tables(d, "pos", index)
    assert got is not None
    pt2, info = got
    _ = int(np.asarray(pt2["table"][:2, 0]).sum())
    load_s = time.perf_counter() - t0
    log(f"load from disk (npy->device): {load_s:.1f}s "
        f"(replaces {info['build_seconds']:.1f}s build)")
    log(f"verdict: cache {'WINS' if load_s < build_s else 'LOSES'} on this "
        f"host<->device path")


if __name__ == "__main__":
    main()
