#!/usr/bin/env python3
"""Does TPU gather cost stay ~size-independent into the multi-GB regime?

Pointer-chase scan: table[i] holds a random next index; one gather of B lanes
per step, 75 steps — the exact shape of the positional-automaton query engine.
Tables are built ON DEVICE (iota hashing) to avoid tunnel transfers.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=("rows",))
def make_table(rows: int, key):
    # word0: pseudo-random next index in [0, rows); word1: payload
    i = jax.lax.iota(jnp.uint32, rows)
    h = (i * jnp.uint32(2654435761)) ^ (i >> 13)
    h = h * jnp.uint32(2246822519)
    nxt = (h % jnp.uint32(rows)).astype(jnp.int32)
    payload = (i & jnp.uint32(0xFFFF)).astype(jnp.int32)
    return jnp.stack([nxt, payload], axis=1)


@functools.partial(jax.jit, static_argnames=("steps",))
def chase(table, start, steps: int):
    def body(pos, _):
        rows = jnp.take(table, pos, axis=0, mode="clip")
        return rows[:, 0], rows[:, 1]
    final, payloads = jax.lax.scan(body, start, None, length=steps)
    return final, payloads[-1]


def main():
    B = 262144
    STEPS = 75
    rng = np.random.default_rng(0)
    for rows in (25_000_000, 100_000_000, 400_000_000, 864_000_000):
        gb = rows * 8 / 1e9
        table = make_table(rows, None)
        jax.block_until_ready(table)
        start = jnp.asarray(rng.integers(0, rows, B).astype(np.int32))
        out = chase(table, start, STEPS)
        _ = int(np.asarray(out[0][:64]).sum())  # axon: block_until_ready lies
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = chase(table, start, STEPS)
            _ = int(np.asarray(out[0][:64]).sum())
            best = min(best, time.perf_counter() - t0)
        ns_per_index = best / (B * STEPS) * 1e9
        log(f"rows={rows:>11,} ({gb:5.1f} GB): {best:.3f}s "
            f"-> {ns_per_index:.1f} ns/index")
        del table
    # and with int64-sized rows (4 x int32) to confirm width-free at this scale
    log("width check at 400M rows x 4 words:")


if __name__ == "__main__":
    main()
