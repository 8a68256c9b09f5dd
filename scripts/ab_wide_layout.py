#!/usr/bin/env python3
"""Timed A/B: full (1 gather x 64 B rows) vs compact (2 gathers x smaller
rows) wide mega layout at gigabase n (VERDICT r4 item 6).

Round 4 established the 23.5 ns/step 64 B-row gather floor by probe, and
the compact layout (34% smaller) existed only as the HBM-pressure
fallback — never timed head-to-head.  This script builds each layout on
device (never coexisting), runs the production query_batch_mega_wide on
identical B x 150 bp batches, and reports ns/step for both.

Usage: python scripts/ab_wide_layout.py [index.npz] [batch]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def log(msg):
    print(f"[ab-wide] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from colbwt_tpu.models.index import ColPmlIndex
    from colbwt_tpu.ops import query_mega_wide as QW
    from colbwt_tpu.utils.log import enable_compilation_cache
    from colbwt_tpu.utils.xfer import device_put_chunked

    enable_compilation_cache(str(REPO / ".bench_cache" / "jax_cache"))
    idx_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chunked_1g/index.npz"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    M = 150
    index = ColPmlIndex.load(idx_path)
    assert index.wide
    log(f"index: n = {index.n:,} r = {index.r:,} sigma = {index.sigma} "
        f"B = {B}")

    rng = np.random.default_rng(0xAB)
    alph = index.alphabet[index.alphabet > 1]
    reads = [rng.choice(alph, M).astype(np.uint8).tobytes()
             for _ in range(B)]
    enc, lens = index.encode_patterns(reads, M)
    enc_j = device_put_chunked(enc.astype(np.uint8))
    lens_j = jnp.asarray(lens)

    def force(p):
        return int(jax.device_get(jnp.sum(p[:, -1])))

    results = {}
    for name, compact in (("full", False), ("compact", True)):
        t0 = time.perf_counter()
        mt = QW.build_mega_table_wide(index, compact=compact)
        key = "mega" if not compact else "percha"
        _ = int(np.asarray(mt[key][:2, 0]).sum())
        tbl_gb = sum(v.nbytes for v in mt.values()
                     if hasattr(v, "nbytes")) / 1e9
        log(f"{name}: table built on device in {time.perf_counter()-t0:.0f}s "
            f"({tbl_gb:.2f} GB)")
        p, c = QW.query_batch_mega_wide(mt, enc_j, lens_j,
                                        ff_bound=index.ff_bound,
                                        packed_out=True)
        _ = force(p)
        draws = []
        for _ in range(3):
            t0 = time.perf_counter()
            p, c = QW.query_batch_mega_wide(mt, enc_j, lens_j,
                                            ff_bound=index.ff_bound,
                                            packed_out=True)
            _ = force(p)
            draws.append(time.perf_counter() - t0)
        best = min(draws)
        ns = best / (B * M) * 1e9
        rps = B / best
        log(f"{name}: best {best:.3f}s of {['%.3f' % d for d in draws]} -> "
            f"{ns:.1f} ns/step, {rps:,.0f} reads/s")
        results[name] = ns
        del mt, p, c
    log(f"VERDICT: full {results['full']:.1f} vs compact "
        f"{results['compact']:.1f} ns/step -> "
        f"{'full' if results['full'] <= results['compact'] else 'compact'} "
        f"wins ({max(results.values()) / min(results.values()):.2f}x)")


if __name__ == "__main__":
    main()
