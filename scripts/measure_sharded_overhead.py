#!/usr/bin/env python3
"""Per-step collective overhead of the sharded query engines on the virtual
CPU mesh (VERDICT round-1 item 6).

Real multi-chip efficiency needs real chips; what IS measurable here is the
*structural* cost the sharding adds per scan step — psum row assembly,
masked local gathers, replicated pattern columns — by comparing per-step
wall time of each sharded engine at dp x ip in {8x1, 4x2, 2x4, 1x8} against
the single-device engine on the identical index and batch, on the same
8-device CPU mesh.  Collectives on the host are memcpys, so these numbers
UNDERSTATE ICI latency but expose the op-count/overhead structure and any
sharding-induced recompute.  Output: a row per (engine, mesh, batch, M).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python
     scripts/measure_sharded_overhead.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def build_index(n_target: int = 400_000):
    from colbwt_tpu.io import native
    from colbwt_tpu.models.index import ColPmlIndex
    from colbwt_tpu.ops import oracle as O

    rng = np.random.default_rng(3)
    doc_len = n_target // 4
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), doc_len)
    docs = []
    for _ in range(4):
        a = base.copy()
        pos = rng.integers(0, doc_len, doc_len // 1000)
        a[pos] = rng.choice(np.frombuffer(b"ACGT", np.uint8), pos.size)
        docs.append(a.tobytes())
    text, ranks, doc_ids = O.concat_collection(docs)
    sa = (native.suffix_array_sais(ranks) if native.available()
          else O.suffix_array(ranks))
    lcp = (native.lcp_kasai(ranks, sa) if native.available()
           else O.lcp_kasai(ranks, sa))
    heads, lens = O.rle(O.bwt_from_sa(text, sa))
    thr = O.compute_thresholds_fast(heads, lens, lcp)
    tbl = O.build_col_pml(heads, lens, np.empty(0, np.int64),
                          np.empty(0, np.int64), thr.astype(np.int64))
    index = ColPmlIndex.build(tbl, ff_bound=2)
    windex = ColPmlIndex.build(tbl, ff_bound=2, wide=True)
    reads = [docs[0][int(s):int(s) + 150]
             for s in rng.integers(0, doc_len - 150, 4096)]
    return index, windex, reads


def time_fn(fn, warmup=1, iters=3):
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(iters):
        t = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t)
    return best


def main():
    from colbwt_tpu.models.index import ColPmlIndex
    from colbwt_tpu.ops import query_mega, query_xla
    from colbwt_tpu.parallel import make_mesh, query_batch_sharded
    from colbwt_tpu.parallel.query_sharded_mega import query_batch_sharded_mega
    from colbwt_tpu.parallel.query_sharded_mega_wide import (
        query_batch_sharded_mega_wide)
    from colbwt_tpu.parallel.query_sharded_pos import query_batch_sharded_pos

    # windex: a forced-wide twin of the same index exercises the w16
    # sharded-wide engine (two-limb positions) at identical shapes
    index, windex, all_reads = build_index()
    print(f"index: n={index.n} r={index.r} ff_bound={index.ff_bound}",
          file=sys.stderr)
    rows = []
    for B, M in ((1024, 160), (4096, 160)):
        reads = all_reads[:B]
        steps = B * M

        # single-device baselines (same 1-CPU device)
        tb = query_xla.index_device_arrays(index)
        enc, lens = index.encode_patterns(reads, max_len=M)
        import jax.numpy as jnp

        ej, lj = jnp.asarray(enc), jnp.asarray(lens)
        t = time_fn(lambda: np.asarray(query_xla.query_batch_device(
            tb, ej, lj, ff_bound=index.ff_bound)[0]))
        rows.append(("xla", "1x1", B, M, t / steps * 1e9))
        mt = query_mega.build_mega_table(index)
        t = time_fn(lambda: np.asarray(query_mega.query_batch_mega(
            mt, ej, lj, ff_bound=index.ff_bound)[0]))
        rows.append(("mega", "1x1", B, M, t / steps * 1e9))

        for dp, ip in ((8, 1), (4, 2), (2, 4), (1, 8)):
            mesh = make_mesh(dp, ip, devices=jax.devices()[:8])
            t = time_fn(lambda: query_batch_sharded(index, reads, mesh=mesh,
                                                    max_len=M))
            rows.append(("sharded", f"{dp}x{ip}", B, M, t / steps * 1e9))
            t = time_fn(lambda: query_batch_sharded_mega(index, reads,
                                                         mesh=mesh, max_len=M))
            rows.append(("sharded-mega", f"{dp}x{ip}", B, M, t / steps * 1e9))
            t = time_fn(lambda: query_batch_sharded_pos(index, reads,
                                                        mesh=mesh, max_len=M,
                                                        k=2))
            rows.append(("sharded-pos", f"{dp}x{ip}", B, M, t / steps * 1e9))
            t = time_fn(lambda: query_batch_sharded_mega_wide(
                windex, reads, mesh=mesh, max_len=M))
            rows.append(("sharded-wide", f"{dp}x{ip}", B, M,
                         t / steps * 1e9))
            print(f"mesh {dp}x{ip} B={B} done", file=sys.stderr)

    print(f"{'engine':<14} {'mesh':<6} {'B':>6} {'M':>4} {'ns/step':>10}")
    for eng, mesh_s, B, M, ns in rows:
        print(f"{eng:<14} {mesh_s:<6} {B:>6} {M:>4} {ns:>10.1f}")


if __name__ == "__main__":
    main()
