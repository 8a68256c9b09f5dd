import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 32768
B = 4096

def probe(name, fn):
    try:
        out = fn(); arr = np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(20):
            r = fn()
        np.asarray(r)
        dt = (time.perf_counter() - t0) / 20
        print(f"{name}: OK {arr.shape} {dt*1e6:.0f} us", flush=True)
        return arr
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return None

# stacked 8-field table: row f = field f; gather along lanes with broadcast idx
table8 = np.tile(np.arange(R, dtype=np.int32)[None, :], (8, 1))
for f in range(8):
    table8[f] += f * 10_000_000
table8 = jnp.asarray(table8)
idx = (np.arange(B, dtype=np.int32) * 7919) % R
idx2d = jnp.asarray(np.tile(idx[None, :], (8, 1)))  # (8, B)

def k1(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)
out = probe("take_along_axis axis1 (8,R)x(8,B)", lambda: pl.pallas_call(
    k1, out_shape=jax.ShapeDtypeStruct((8, B), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(table8, idx2d))
if out is not None:
    expect = np.asarray(table8)[np.arange(8)[:, None], np.tile(idx[None, :], (8, 1))]
    print("correct:", np.array_equal(out, expect), flush=True)

# chained version: 150 dependent steps of the same op (the query-loop shape)
def k2(t_ref, i_ref, o_ref):
    def body(j, s):
        rows = jnp.take_along_axis(t_ref[:], s, axis=1)  # (8, B)
        return (rows * 7919 + 13) % R
    o_ref[:] = jax.lax.fori_loop(0, 150, body, i_ref[:])
probe("chain 150 take_along", lambda: pl.pallas_call(
    k2, out_shape=jax.ShapeDtypeStruct((8, B), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(table8, idx2d))

# XLA equivalent of the chain for comparison
@jax.jit
def xla_chain(t, i):
    def body(j, s):
        rows = jnp.take_along_axis(t, s, axis=1)
        return (rows * 7919 + 13) % R
    return jax.lax.fori_loop(0, 150, body, i)
probe("chain 150 XLA take_along", lambda: xla_chain(table8, idx2d))
