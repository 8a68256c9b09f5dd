#!/usr/bin/env python3
"""Probe variants of the mega-engine scan body on the real chip.

Loads the cached bench index (.bench_cache/) and times:
  v0  current query_batch_mega (baseline re-measure)
  v1  packed single output (pml<<8 | cid)
  v2  v1 + unroll sweep
  v3  v1 with uint8 pattern columns
  v4  two half-batch chains inside one jit (gather overlap test)
  v5  double batch (B=524288) per-read cost
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

from colbwt_tpu.models.index import ColPmlIndex
from colbwt_tpu.ops import query_mega
from colbwt_tpu.utils.log import enable_compilation_cache

CACHE = REPO / ".bench_cache"
READ_LEN = 150


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, reps=3):
    fn()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
        best = min(best, time.perf_counter() - t0)
    return best


# --- variant scan bodies -----------------------------------------------------

@functools.partial(jax.jit, static_argnames=("unroll",))
def packed_scan(mt, patterns, unroll=4):
    """masked=False body emitting one packed int32 per step."""
    B, M = patterns.shape
    r = mt["r"]
    mega = mt["mega"]
    cols = patterns[:, ::-1].T.astype(jnp.int32)

    n_ = mt["n"]
    state = (jnp.broadcast_to(r - 1, (B,)).astype(jnp.int32),
             jnp.broadcast_to(mt["last_len"] - 1, (B,)).astype(jnp.int32),
             jnp.broadcast_to(n_ - 1, (B,)).astype(jnp.int32),
             jnp.zeros((B,), dtype=jnp.int32))

    def body(state, c):
        interval, offset, pos, mlen = state
        rows = jnp.take(mega, c * r + interval, axis=0, mode="clip")
        match = rows[:, 0] == 1
        doff = rows[:, 3] + offset
        lf_pos = rows[:, 4] + offset
        over = doff >= rows[:, 5]
        di = rows[:, 2] + over.astype(jnp.int32)
        doff = doff - jnp.where(over, rows[:, 5], 0)
        thr = rows[:, 6]
        take_pred = (~match) & (pos < thr) & (rows[:, 10] >= 0)
        take_succ = (~match) & (~take_pred) & (thr < n_)
        new_interval = jnp.where(take_pred, rows[:, 10],
                                 jnp.where(take_succ, rows[:, 7], di))
        new_offset = jnp.where(take_pred, rows[:, 11],
                               jnp.where(take_succ, rows[:, 8], doff))
        new_pos = jnp.where(take_pred, rows[:, 12],
                            jnp.where(take_succ, rows[:, 9], lf_pos))
        new_len = jnp.where(match, mlen + 1, 0)
        packed = (new_len << 8) | rows[:, 1]
        return ((new_interval, new_offset, new_pos, new_len), packed)

    _, out = jax.lax.scan(body, state, cols, unroll=unroll)
    pml = out >> 8
    cid = out & 0xFF
    return pml.T[:, ::-1], cid.T[:, ::-1]


@functools.partial(jax.jit, static_argnames=("unroll",))
def twin_scan(mt, pat_a, pat_b, unroll=4):
    """Two independent half-batch scans in one computation."""
    a = packed_body_pair(mt, pat_a, unroll)
    b = packed_body_pair(mt, pat_b, unroll)
    return a, b


def packed_body_pair(mt, patterns, unroll):
    B, M = patterns.shape
    r = mt["r"]
    mega = mt["mega"]
    n_ = mt["n"]
    cols = patterns[:, ::-1].T.astype(jnp.int32)
    state = (jnp.broadcast_to(r - 1, (B,)).astype(jnp.int32),
             jnp.broadcast_to(mt["last_len"] - 1, (B,)).astype(jnp.int32),
             jnp.broadcast_to(n_ - 1, (B,)).astype(jnp.int32),
             jnp.zeros((B,), dtype=jnp.int32))

    def body(state, c):
        interval, offset, pos, mlen = state
        rows = jnp.take(mega, c * r + interval, axis=0, mode="clip")
        match = rows[:, 0] == 1
        doff = rows[:, 3] + offset
        lf_pos = rows[:, 4] + offset
        over = doff >= rows[:, 5]
        di = rows[:, 2] + over.astype(jnp.int32)
        doff = doff - jnp.where(over, rows[:, 5], 0)
        thr = rows[:, 6]
        take_pred = (~match) & (pos < thr) & (rows[:, 10] >= 0)
        take_succ = (~match) & (~take_pred) & (thr < n_)
        new_interval = jnp.where(take_pred, rows[:, 10],
                                 jnp.where(take_succ, rows[:, 7], di))
        new_offset = jnp.where(take_pred, rows[:, 11],
                               jnp.where(take_succ, rows[:, 8], doff))
        new_pos = jnp.where(take_pred, rows[:, 12],
                            jnp.where(take_succ, rows[:, 9], lf_pos))
        new_len = jnp.where(match, mlen + 1, 0)
        packed = (new_len << 8) | rows[:, 1]
        return ((new_interval, new_offset, new_pos, new_len), packed)

    _, out = jax.lax.scan(body, state, cols, unroll=unroll)
    return out[-1]


def main():
    enable_compilation_cache(str(CACHE / "jax_cache"))
    index = ColPmlIndex.load(CACHE / "bench_index_k2.npz")
    log(f"index r={index.r} n={index.n} ff={index.ff_bound}")
    mt = query_mega.build_mega_table(index)

    rng = np.random.default_rng(0x5EED)
    B = 262144
    enc = rng.integers(2, 6, size=(B, READ_LEN)).astype(np.int32)
    # realistic reads matter for timing only via memory patterns; random chars
    # over the DNA alphabet exercise the same gather distribution
    from colbwt_tpu.utils.xfer import device_put_chunked
    enc_j = device_put_chunked(enc)
    lens_j = jnp.full((B,), READ_LEN, dtype=jnp.int32)

    t = timeit(lambda: query_mega.query_batch_mega(
        mt, enc_j, lens_j, ff_bound=index.ff_bound))
    log(f"v0 current              : {t:.3f}s  {B/t/1e3:.1f}k reads/s")

    t = timeit(lambda: packed_scan(mt, enc_j))
    log(f"v1 packed out unroll=4  : {t:.3f}s  {B/t/1e3:.1f}k reads/s")

    for u in (1, 2, 8, 16):
        t = timeit(lambda u=u: packed_scan(mt, enc_j, unroll=u))
        log(f"v2 packed out unroll={u:<2} : {t:.3f}s  {B/t/1e3:.1f}k reads/s")

    enc8 = jnp.asarray(enc.astype(np.uint8))
    t = timeit(lambda: packed_scan(mt, enc8))
    log(f"v3 packed uint8 cols    : {t:.3f}s  {B/t/1e3:.1f}k reads/s")

    half = B // 2
    a, b = enc_j[:half], enc_j[half:]
    t = timeit(lambda: twin_scan(mt, a, b))
    log(f"v4 twin half-batch      : {t:.3f}s  {B/t/1e3:.1f}k reads/s")

    enc2 = jnp.concatenate([enc_j, enc_j], axis=0)
    t = timeit(lambda: packed_scan(mt, enc2))
    log(f"v5 double batch         : {t:.3f}s  {2*B/t/1e3:.1f}k reads/s")


if __name__ == "__main__":
    main()
