#!/usr/bin/env python3
"""Probe the wide engine's per-step residual (VERDICT r3 weak #7).

The narrow mega engine runs at the ~16 ns/gather structural floor; the wide
engine measured ~31 ns/step at n = 2.3e9.  Candidate causes: the 17-column
row (68 B — crosses the 64 B alignment the 16-column narrow row sits on),
the two-plane int32 output, the limb arithmetic, scan unroll depth.  This
probe isolates them on the cached n = 1.15e9 chunked-construction index
(/tmp/chunked_1g/index.npz):

  A  baseline: two int32 planes, width 17, unroll 4   (r3 shipped config)
  B  packed_out u16 plane, width 17, unroll 4
  C  packed_out, table padded to 20 cols (80 B rows)
  D  packed_out, table padded to 24 cols (96 B rows)
  E  packed_out, table padded to 32 cols (128 B rows, aligned)
  F  best-width + unroll 8
"""

from __future__ import annotations

import gc
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def log(msg):
    print(f"[probe] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from colbwt_tpu.models.index import ColPmlIndex
    from colbwt_tpu.ops import query_mega_wide as QW
    from colbwt_tpu.utils.log import enable_compilation_cache

    enable_compilation_cache(str(REPO / ".bench_cache" / "jax_cache"))
    idx_path = Path(sys.argv[1] if len(sys.argv) > 1
                    else "/tmp/chunked_1g/index.npz")
    index = ColPmlIndex.load(idx_path)
    log(f"index: n = {index.n:,} r = {index.r:,} wide = {index.wide}")

    B, M = 65_536, 150
    rng = np.random.default_rng(7)
    reads = [bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), M).tobytes())
             for _ in range(B)]
    enc, lens = index.encode_patterns(reads, max_len=M)
    enc_j = jnp.asarray(enc.astype(np.uint8))
    lens_j = jnp.asarray(lens)

    t = time.perf_counter()
    mt = QW.build_mega_table_wide(index)
    _ = int(np.asarray(mt["mega"][:2, 0]).sum())
    log(f"table built on device: {time.perf_counter() - t:.0f}s "
        f"({mt['mega'].nbytes / 1e9:.1f} GB)")

    import functools

    @functools.partial(jax.jit, static_argnames=("width",),
                       donate_argnums=(0,))
    def pad_table(tab, width: int):
        # donation frees the unpadded table once the copy lands: peak HBM
        # is old + new during the op, old freed after (w <= 24 fits v5e)
        rows = tab.shape[0]
        buf = jnp.zeros((rows, width), dtype=jnp.int32)
        return jax.lax.dynamic_update_slice(buf, tab, (0, 0))

    def run(mt_v, packed, unroll, tag):
        def call():
            out = QW.query_batch_mega_wide(mt_v, enc_j, lens_j,
                                           ff_bound=index.ff_bound,
                                           packed_out=packed, unroll=unroll)
            p = out[0]
            _ = int(np.asarray(p[:1, -1])[0])
            return p

        t0 = time.perf_counter()
        call()
        log(f"{tag}: first (compile) {time.perf_counter() - t0:.1f}s")
        best = 1e18
        for _ in range(3):
            t0 = time.perf_counter()
            call()
            best = min(best, time.perf_counter() - t0)
        ns = best / (B * M) * 1e9
        log(f"{tag}: {best:.3f}s -> {B / best:,.0f} reads/s "
            f"({ns:.1f} ns/step)")
        return best

    results = {17: run(mt, True, 4, "B packed  w17 u4")}
    run(mt, False, 4, "A two-plane w17 u4")
    run(mt, True, 8, "F packed w17 u8")
    run(mt, True, 2, "G packed w17 u2")
    for w in (20, 24):
        tab = pad_table(mt.pop("mega"), w)  # donates the old table
        _ = int(np.asarray(tab[:1, 0])[0])
        mt_v = dict(mt, mega=tab)
        results[w] = run(mt_v, True, 4, f"packed w{w} u4")
        del tab, mt_v
        gc.collect()
        if w != 24:
            t = time.perf_counter()
            mt["mega"] = QW.build_mega_table_wide(index)["mega"]
            _ = int(np.asarray(mt["mega"][:2, 0]).sum())
            log(f"table rebuilt ({time.perf_counter() - t:.0f}s)")
    log(f"ns/step by width: "
        f"{ {w: round(v / (B * M) * 1e9, 1) for w, v in results.items()} }")


if __name__ == "__main__":
    main()
