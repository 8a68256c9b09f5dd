import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools

R = 32768   # table rows (fits VMEM: 32k x 4B = 128KB .. x8 = 1MB)
B = 1024

def probe(name, fn):
    try:
        out = fn()
        out = np.asarray(out)
        # time it
        t0 = time.perf_counter()
        for _ in range(50):
            r = fn()
        np.asarray(r)
        dt = (time.perf_counter() - t0) / 50
        print(f"{name}: OK {out.shape} {dt*1e6:.0f} us", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)

table1 = jnp.arange(R, dtype=jnp.int32)
table2 = jnp.tile(jnp.arange(R, dtype=jnp.int32)[:, None], (1, 8))
idx = (jnp.arange(B, dtype=jnp.int32) * 7919) % R

# 1) 1D take of 1D table
def k1(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take(t_ref[:], i_ref[:], mode="clip")
probe("1D take", lambda: pl.pallas_call(
    k1, out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(table1, idx))

# 2) row take of (R,8) table
def k2(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0, mode="clip")
probe("row take axis0", lambda: pl.pallas_call(
    k2, out_shape=jax.ShapeDtypeStruct((B, 8), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(table2, idx))

# 3) chained take (the actual loop shape): 150 dependent gathers
def k3(t_ref, i_ref, o_ref):
    def body(j, s):
        return jnp.take(t_ref[:], (s * 7919 + 13) % R, mode="clip")
    o_ref[:] = jax.lax.fori_loop(0, 150, body, i_ref[:])
probe("chain 150x 1D take", lambda: pl.pallas_call(
    k3, out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(table1, idx))

# 4) XLA reference for the same chain
@jax.jit
def xla_chain(t, i):
    def body(j, s):
        return jnp.take(t, (s * 7919 + 13) % R, mode="clip")
    return jax.lax.fori_loop(0, 150, body, i)
probe("chain 150x XLA", lambda: xla_chain(table1, idx))

# 5) bigger B inside pallas (grid over tiles)
B2 = 32768
idx2 = (jnp.arange(B2, dtype=jnp.int32) * 7919) % R
def k5(t_ref, i_ref, o_ref):
    def body(j, s):
        return jnp.take(t_ref[:], (s * 7919 + 13) % R, mode="clip")
    o_ref[:] = jax.lax.fori_loop(0, 150, body, i_ref[:])
probe("chain B=32k pallas", lambda: pl.pallas_call(
    k5, out_shape=jax.ShapeDtypeStruct((B2,), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(table1, idx2))
probe("chain B=32k XLA", lambda: xla_chain(table1, idx2))
