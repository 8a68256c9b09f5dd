#!/usr/bin/env python3
"""Probe: does a 64-byte (16-column) wide row fix the 31 ns/step residual?

probe_wide_step.py showed the wide engine's per-step cost is invariant to
output packing and unroll — the 17-column (68 B) row gather itself costs
~31 ns vs the ~16 ns of 8 B pos rows.  Hypothesis: 68 B rows straddle a
64 B access boundary; folding the 1-bit match flag into the CID column's
bit 8 gives a 16-column (64 B) row with identical information.

Builds the w16 table DIRECTLY on device (never coexists with the w17
table) and runs a w16 variant of the scan body.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def log(msg):
    print(f"[w16] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from colbwt_tpu.models.index import ColPmlIndex
    from colbwt_tpu.ops import query_mega_wide as QW
    from colbwt_tpu.utils.log import enable_compilation_cache

    enable_compilation_cache(str(REPO / ".bench_cache" / "jax_cache"))
    index = ColPmlIndex.load(sys.argv[1] if len(sys.argv) > 1
                             else "/tmp/chunked_1g/index.npz")
    log(f"index: n = {index.n:,} r = {index.r:,}")
    r = index.r
    sigma = index.sigma

    @functools.partial(jax.jit, static_argnames=("ff_bound",),
                       donate_argnums=(0,))
    def fill_block_16(buf, c, char, col_id, di, doff, length, idx_lo, idx_hi,
                      thr_lo, thr_hi, n_lo, n_hi, ff_bound: int):
        cols = QW._device_block_cols(c, char, col_id, di, doff, length,
                                     idx_lo, idx_hi, thr_lo, thr_hi,
                                     n_lo, n_hi, ff_bound)
        mc = (cols[0] << 8) | cols[1]  # match bit 8 | cid bits 0..7
        block = jnp.stack((mc,) + cols[2:], axis=1)  # 16 columns
        return jax.lax.dynamic_update_slice(buf, block, (c * char.shape[0], 0))

    arrays = QW._device_run_arrays(index)
    meta = QW._meta(index)
    n_lo, n_hi = meta["n_lo"], meta["n_hi"]
    t = time.perf_counter()
    buf = jnp.zeros(((sigma + 1) * r, 16), dtype=jnp.int32)
    for c in range(sigma + 1):
        buf = fill_block_16(buf, jnp.int32(c), *arrays, n_lo, n_hi,
                            ff_bound=index.ff_bound)
    _ = int(np.asarray(buf[:2, 0]).sum())
    log(f"w16 table built on device: {time.perf_counter() - t:.0f}s "
        f"({buf.nbytes / 1e9:.1f} GB)")
    length_arr = arrays[4]

    LIMB = QW.LIMB
    _lt = QW._lt

    @functools.partial(jax.jit, static_argnames=("unroll", "ff_bound"))
    def query_w16(mega, length_arr, patterns, lengths, r, n_lo, n_hi,
                  last_len, pos0_lo, pos0_hi, unroll: int = 4,
                  ff_bound: int = 2):
        B, M = patterns.shape
        cols = patterns[:, ::-1].T.astype(jnp.int32)

        state = (jnp.broadcast_to(r - 1, (B,)).astype(jnp.int32),
                 jnp.broadcast_to(last_len - 1, (B,)).astype(jnp.int32),
                 jnp.broadcast_to(pos0_lo, (B,)).astype(jnp.int32),
                 jnp.broadcast_to(pos0_hi, (B,)).astype(jnp.int32),
                 jnp.zeros((B,), dtype=jnp.int32))

        def body(state, c):
            interval, offset, pos_lo, pos_hi, mlen = state
            rows = jnp.take(mega, c * r + interval, axis=0, mode="clip")
            mc = rows[:, 0]
            match = (mc >> 8) == 1
            cid_out = mc & 0xFF
            doff = rows[:, 2] + offset
            lf_lo = rows[:, 3] + offset
            carry = (lf_lo >= LIMB).astype(jnp.int32)
            lf_lo = lf_lo - carry * LIMB
            lf_hi = rows[:, 4] + carry
            over = doff >= rows[:, 5]
            di = rows[:, 1] + over.astype(jnp.int32)
            doff = doff - jnp.where(over, rows[:, 5], 0)
            for _ in range(ff_bound - 2):
                ln = jnp.take(length_arr, di, mode="clip")
                over = doff >= ln
                di = di + over.astype(jnp.int32)
                doff = doff - jnp.where(over, ln, 0)
            thr_lo, thr_hi = rows[:, 6], rows[:, 7]
            use_pred = _lt(pos_hi, pos_lo, thr_hi, thr_lo)
            has_pred = rows[:, 12] >= 0
            has_succ = _lt(thr_hi, thr_lo, n_hi, n_lo)
            take_pred = (~match) & use_pred & has_pred
            take_succ = (~match) & (~take_pred) & has_succ
            ni = jnp.where(take_pred, rows[:, 12],
                           jnp.where(take_succ, rows[:, 8], di))
            no = jnp.where(take_pred, rows[:, 13],
                           jnp.where(take_succ, rows[:, 9], doff))
            nlo = jnp.where(take_pred, rows[:, 14],
                            jnp.where(take_succ, rows[:, 10], lf_lo))
            nhi = jnp.where(take_pred, rows[:, 15],
                            jnp.where(take_succ, rows[:, 11], lf_hi))
            nlen = jnp.where(match, mlen + 1, 0)
            return ((ni, no, nlo, nhi, nlen), (nlen << 8) | cid_out)

        _, packed = jax.lax.scan(body, state, cols, unroll=unroll)
        return packed.T[:, ::-1].astype(jnp.uint16)

    B, M = 65_536, 150
    rng = np.random.default_rng(7)
    reads = [bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), M).tobytes())
             for _ in range(B)]
    enc, lens = index.encode_patterns(reads, max_len=M)
    enc_j = jnp.asarray(enc.astype(np.uint8))
    lens_j = jnp.asarray(lens)

    def call():
        p = query_w16(buf, length_arr, enc_j, lens_j, meta["r"],
                      n_lo, n_hi, meta["last_len"], meta["pos0_lo"],
                      meta["pos0_hi"], ff_bound=index.ff_bound)
        _ = int(np.asarray(p[:1, -1])[0])
        return p

    t0 = time.perf_counter()
    p16 = np.asarray(call())
    log(f"first (compile): {time.perf_counter() - t0:.1f}s")
    best = 1e18
    for _ in range(3):
        t0 = time.perf_counter()
        call()
        best = min(best, time.perf_counter() - t0)
    log(f"w16: {best:.3f}s -> {B / best:,.0f} reads/s "
        f"({best / (B * M) * 1e9:.1f} ns/step)")

    # correctness vs the shipped w17 engine on a subset (rebuild costs HBM:
    # free the w16 table first, then compare planes)
    del buf
    import gc

    gc.collect()
    mt = QW.build_mega_table_wide(index)
    sub = 4096
    pk, _ = QW.query_batch_mega_wide(mt, enc_j[:sub], lens_j[:sub],
                                     ff_bound=index.ff_bound,
                                     packed_out=True)
    np.testing.assert_array_equal(np.asarray(pk), p16[:sub])
    log("EXACT match w16 vs shipped w17 on 4096 reads")


if __name__ == "__main__":
    main()
