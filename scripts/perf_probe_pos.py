#!/usr/bin/env python3
"""Time the positional-automaton engine on the bench index, k = 1, 2, 3."""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

from colbwt_tpu.models.index import ColPmlIndex
from colbwt_tpu.ops import query_pos
from colbwt_tpu.utils.log import enable_compilation_cache

CACHE = REPO / ".bench_cache"
READ_LEN = 150
B = 262144


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    enable_compilation_cache(str(CACHE / "jax_cache"))
    index = ColPmlIndex.load(CACHE / "bench_index_k2.npz")
    A = index.sigma + 1
    log(f"index r={index.r} n={index.n} sigma={index.sigma}")

    rng = np.random.default_rng(0x5EED)
    enc = rng.integers(0, index.sigma, size=(B, READ_LEN)).astype(np.int32)
    lens = np.full((B,), READ_LEN, dtype=np.int32)

    for k in (1, 2, 3):
        keys = A ** k
        gb = keys * index.n * 8 / 1e9
        if keys * index.n > 2**31 - 1:
            log(f"k={k}: table {gb:.1f} GB overflows int32 indices, skip")
            continue
        t0 = time.perf_counter()
        pt = query_pos.build_pos_tables(index, k=k)
        _ = int(np.asarray(pt["table"][:2, 0]).sum())
        log(f"k={k}: table {gb:.2f} GB built on device in "
            f"{time.perf_counter()-t0:.1f}s")
        M = -(-READ_LEN // k) * k
        pad = np.zeros((B, M - READ_LEN), dtype=np.int32)
        enc_k = jnp.asarray(np.concatenate([pad, enc], axis=1))
        lens_j = jnp.asarray(lens)
        out = query_pos.query_batch_pos(pt["table"], pt["n"], enc_k, lens_j,
                                        k=k, A=A)
        _ = int(np.asarray(out[0][:, -1]).sum())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = query_pos.query_batch_pos(pt["table"], pt["n"], enc_k,
                                            lens_j, k=k, A=A)
            _ = int(np.asarray(out[0][:, -1]).sum())
            best = min(best, time.perf_counter() - t0)
        log(f"k={k}: {best:.3f}s  {B/best/1e3:.1f}k reads/s  "
            f"({best/ (B * READ_LEN) * 1e9:.1f} ns/char)")
        del pt
    log("done")


if __name__ == "__main__":
    main()
